"""Whole-slide prediction/uncertainty heatmaps via batched grid inference.

Stand-in for sf.Heatmap (SURVEY.md §2.3 E7; reference call sites
results.py:216-227): runs the UQ interface over the slide's tile grid and
exposes ``logits`` (y, x, classes) and ``uncertainty`` (y, x, 1) arrays —
the exact attributes the reference masks for Figure 5
(``hm.logits[uq_mask, :] = [-1, -1]``, results.py:222-223) — plus
``save()`` with a configurable colormap.

TPU-first: tiles stream through the same jitted stain-norm -> trunk ->
fused K-pass MC-dropout head pipeline as training validation; the grid
assembly is host-side numpy.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .data.slide import WSI
from .utils_log import log


class Heatmap:
    def __init__(
        self,
        slide: str,
        model: str,
        stride_div: int = 1,
        batch_size: int = 64,
        uq: bool = True,
        k: Optional[int] = None,
        qc: Optional[str] = None,
    ):
        """Compute grid predictions for one slide.

        Args:
            slide: path to the whole-slide image.
            model: path to a saved `..._epoch{E}` model dir.
            stride_div: grid stride divisor (1 = non-overlapping).
        """
        import jax

        from .train.uq import UncertaintyInterface

        self.interface = UncertaintyInterface(model, k=k)
        hp = self.interface.hp
        self.wsi = WSI(
            slide, hp.tile_px, hp.tile_um, stride_div=stride_div, qc=qc
        )
        gx, gy = self.wsi.grid_x, self.wsi.grid_y
        n_classes = 2
        self.logits = np.full((gy, gx, n_classes), -99.0, np.float32)
        self.uncertainty = np.full((gy, gx, 1), -99.0, np.float32)

        batch_imgs, batch_locs = [], []
        key = jax.random.PRNGKey(0)

        def flush():
            nonlocal batch_imgs, batch_locs, key
            if not batch_imgs:
                return
            key, sub = jax.random.split(key)
            # Pad to the full batch for a single compiled shape.
            n_valid = len(batch_imgs)
            while len(batch_imgs) < batch_size:
                batch_imgs.append(np.zeros_like(batch_imgs[0]))
            probs, unc = self.interface(np.stack(batch_imgs), key=sub)
            probs = np.asarray(probs)[:n_valid]
            unc = np.asarray(unc)[:n_valid]
            for (i, j), p, u in zip(batch_locs, probs, unc):
                self.logits[j, i] = p
                self.uncertainty[j, i, 0] = u[1]
            batch_imgs, batch_locs = [], []

        for item in self.wsi.build_generator(include_loc="grid")():
            batch_imgs.append(item["image"])
            batch_locs.append(item["loc"])
            if len(batch_imgs) == batch_size:
                flush()
        flush()
        log.info(
            f"Heatmap computed for {self.wsi.name}: grid {gx}x{gy}"
        )

    def save(self, outdir: str, cmap="inferno", show_roi: bool = False):
        """Save prediction and uncertainty heatmap PNGs
        (hm.save contract, results.py:217-227)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs(outdir, exist_ok=True)
        masked_logits = np.ma.masked_where(
            self.logits[:, :, 1] == -99.0, self.logits[:, :, 1]
        )
        masked_unc = np.ma.masked_where(
            self.uncertainty[:, :, 0] == -99.0, self.uncertainty[:, :, 0]
        )
        for arr, name, cm in (
            (masked_logits, "preds", cmap),
            (masked_unc, "uncertainty", "viridis"),
        ):
            fig, ax = plt.subplots(figsize=(10, 10))
            im = ax.imshow(arr, cmap=cm, vmin=None, vmax=None)
            fig.colorbar(im, ax=ax)
            ax.set_title(f"{self.wsi.name} {name}")
            ax.axis("off")
            fig.savefig(
                os.path.join(outdir, f"{self.wsi.name}-{name}.png"),
                bbox_inches="tight", dpi=150,
            )
            plt.close(fig)
