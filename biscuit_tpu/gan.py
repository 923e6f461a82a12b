"""GAN-intermediate synthetic-tile consumption path (SURVEY.md §2.3 E13;
BASELINE.json configs[5]).

The reference study trains a class-conditional StyleGAN2 in a separate repo
and consumes its output here: 512px/400um synthetic tiles (including
embedding-interpolated "GAN-intermediate" images) packed as tfrecords in a
``LUNG_GAN`` source, resized to 299px, mixed into training at a
``gan`` fraction (experiment.py:103-143, configure.py:77-83,135-149), and
scored through the UQ threshold pipeline. Training the GAN is out of scope
(README.md:41-73 delegates to slideflow-gan); this module implements the
consumption path TPU-first:

* :func:`resize_batch` — on-chip bilinear 512->299 resize that fuses with
  the stain normalizer and trunk (no host round trip);
* :func:`score_gan_tiles` — K-pass MC-dropout UQ scoring of synthetic tiles
  with the tile-prediction CSV contract, so GAN tiles flow through
  threshold.detect/apply unchanged;
* :func:`add_gan_annotations` — annotation rows with site='GAN' and gan=1,
  the schema Experiment.add's GAN fraction selects on (experiment.py:123-143).
"""

from __future__ import annotations

import os
from os.path import join
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from .utils_log import log


def resize_batch(images, out_px: int):
    """Bilinear resize (N, H, W, C) -> (N, out_px, out_px, C) on-chip."""
    import jax
    import jax.numpy as jnp

    images = jnp.asarray(images)
    n, _, _, c = images.shape
    return jax.image.resize(
        images.astype(jnp.float32), (n, out_px, out_px, c), method="bilinear"
    )


def score_gan_tiles(
    model_path: str,
    gan_tfrecords: List[str],
    outcome: str = "cohort",
    out_csv: Optional[str] = None,
    batch_size: int = 64,
    k: Optional[int] = None,
    max_tiles: Optional[int] = None,
    gan_px: int = 512,
):
    """Score synthetic tiles through the UQ pipeline.

    Reads gan_px tiles, resizes on-chip to the model's tile_px, runs stain
    norm + standardization + K-pass MC dropout, and returns (and optionally
    writes) a tile-predictions frame with the standard column contract
    (slide, {outcome}_y_true0, {outcome}_y_pred*, {outcome}_uncertainty*),
    ready for threshold.detect/apply.
    """
    import jax
    import jax.numpy as jnp

    from .data.normalize import make_normalizer, per_image_standardization
    from .data.pipeline import TileBatcher
    from .train.trainer import load_checkpoint, tile_predictions_frame
    from .train.uq import mc_dropout_predict

    model, params, batch_stats, hp, _ = load_checkpoint(model_path)
    normalizer = make_normalizer(hp.normalizer)
    k = k if k is not None else hp.uq_samples

    @jax.jit
    def step(p, bs, imgs, key):
        x = resize_batch(imgs, hp.tile_px)
        if normalizer is not None:
            x = normalizer(x)
        x = per_image_standardization(x)
        return mc_dropout_predict(model, p, bs, x, key, k=k)

    batcher = TileBatcher(
        gan_tfrecords, {}, batch_size=batch_size, shuffle=False,
        infinite=False, max_tiles=max_tiles, tile_px=gan_px,
    )
    key = jax.random.PRNGKey(0)
    rows = {"slide": [], "loc_x": [], "loc_y": [], "y_true": []}
    probs_all, unc_all = [], []
    for batch in batcher:
        key, sub = jax.random.split(key)
        mean, std = step(params, batch_stats, batch["image"], sub)
        m = np.asarray(batch["mask"])
        probs_all.append(np.asarray(mean)[m])
        unc_all.append(np.asarray(std)[m])
        for i in np.where(m)[0]:
            rows["slide"].append(batch["slide"][i])
            rows["loc_x"].append(int(batch["loc"][i, 0]))
            rows["loc_y"].append(int(batch["loc"][i, 1]))
            rows["y_true"].append(int(batch["label"][i]))
    batcher.close()
    probs = (np.concatenate(probs_all) if probs_all
             else np.zeros((0, 2), np.float32))
    unc = np.concatenate(unc_all) if unc_all else None
    df = tile_predictions_frame(outcome, pd.DataFrame(rows), probs, unc)
    if out_csv:
        os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
        df.to_csv(out_csv, index=False)
        log.info(f"GAN tile predictions -> {out_csv}")
    return df


def add_gan_annotations(
    annotations_path: str,
    gan_slides: Dict[str, str],
    outcome: str = "cohort",
) -> None:
    """Append GAN synthetic-slide rows (site='GAN', gan=1) to an annotations
    file — the schema Experiment.add's GAN fraction machinery selects on.

    Args:
        gan_slides: {slide_name: outcome_label} for the synthetic tfrecords.
    """
    ann = pd.read_csv(annotations_path, dtype=str)
    if "gan" not in ann.columns:
        ann["gan"] = "0"
    if "site" not in ann.columns:
        ann["site"] = "?"
    if "order" not in ann.columns:
        ann["order"] = [str(i) for i in range(len(ann))]
    new_rows = []
    existing = set(ann["slide"])
    max_order = pd.to_numeric(ann["order"]).max()
    for i, (slide, label) in enumerate(sorted(gan_slides.items())):
        if slide in existing:
            continue
        new_rows.append(
            {
                "patient": slide,
                "slide": slide,
                outcome: label,
                "site": "GAN",
                "gan": "1",
                "order": str(int(max_order) + 1 + i),
            }
        )
    if new_rows:
        ann = pd.concat([ann, pd.DataFrame(new_rows)], ignore_index=True)
        ann.to_csv(annotations_path, index=False)
        log.info(f"Added {len(new_rows)} GAN rows to {annotations_path}")
