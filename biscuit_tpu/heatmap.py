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


def _load_interface(model: str, k: Optional[int]):
    """(callable, tile_px, tile_um) from a model dir OR a servable
    artifact (*.biscuit). Both expose the UncertaintyInterface call
    contract ``(tiles, key=) -> (probs, uncertainty)``, so grid inference
    is source-agnostic: heatmaps and Figure-5 tile export run on serving
    fleets holding only the exported artifact. Dispatch sniffs the
    container magic (artifacts may carry any filename — cli/export.py
    ``-o``), not the ``.biscuit`` suffix."""
    from .serve import is_servable_artifact

    if is_servable_artifact(model):
        from .serve import load_servable

        sv = load_servable(model)
        if k is not None and k != sv.k:
            raise ValueError(
                f"k={k} requested but the artifact bakes K={sv.k}; "
                "re-export with the wanted k")
        if sv.tile_um is None:
            raise ValueError(
                "artifact predates tile_um in the servable header; "
                "re-export it (or use a model dir)")
        return sv, sv.tile_px, sv.tile_um
    from .train.uq import UncertaintyInterface

    interface = UncertaintyInterface(model, k=k)
    return interface, interface.hp.tile_px, interface.hp.tile_um


def _auto_batch(batch_size, interface, default: int = 64) -> int:
    """Resolve batch_size=None: a servable artifact dispatches at its
    exported static batch — feeding it the 64-tile host default would pad
    every flush to the exported batch (up to 16x wasted compute at the
    documented 1024-tile serving config). Checkpoint interfaces jit at
    whatever shape they're given; 64 keeps host memory small."""
    if batch_size is not None:
        return batch_size
    exported = getattr(interface, "batch_size", None)
    return int(exported) if exported else default


def export_tiles_by_uncertainty(
    slide: str,
    model: str,
    tile_uq: float,
    outdir: str,
    batch_size: Optional[int] = None,
    k: Optional[int] = None,
    max_tiles: Optional[int] = None,
    qc: Optional[str] = None,
):
    """Per-tile UQ inference over a slide, exporting tile PNGs into
    ``uq_incl/`` (uncertainty < threshold) and ``uq_excl/`` directories.

    This is the reference's Figure-5 tile loop (SURVEY.md §3.3 / reference
    results.py:234-265): normalizer -> standardization -> K-pass MC dropout
    -> route by the tile uncertainty threshold. The reference runs it one
    tile at a time through TF; here tiles stream in batches through the
    jitted UQ pipeline (the BASELINE.json hot-loop target).

    Returns (n_included, n_excluded).
    """
    import jax
    from PIL import Image

    interface, tile_px, tile_um = _load_interface(model, k)
    batch_size = _auto_batch(batch_size, interface)
    wsi = WSI(slide, tile_px, tile_um, qc=qc)
    incl_dir = os.path.join(outdir, "uq_incl")
    excl_dir = os.path.join(outdir, "uq_excl")
    os.makedirs(incl_dir, exist_ok=True)
    os.makedirs(excl_dir, exist_ok=True)

    n_incl = n_excl = 0
    batch_imgs, batch_locs = [], []
    key = jax.random.PRNGKey(0)

    def flush():
        nonlocal batch_imgs, batch_locs, key, n_incl, n_excl
        if not batch_imgs:
            return
        key, sub = jax.random.split(key)
        n_valid = len(batch_imgs)
        while len(batch_imgs) < batch_size:
            batch_imgs.append(np.zeros_like(batch_imgs[0]))
        _probs, unc = interface(np.stack(batch_imgs), key=sub)
        unc = np.asarray(unc)[:n_valid, 1]
        for img, (i, j), u in zip(batch_imgs[:n_valid], batch_locs, unc):
            dest = incl_dir if u < tile_uq else excl_dir
            Image.fromarray(img).save(
                os.path.join(dest, f"{wsi.name}-{i}-{j}-{u:.5f}.png")
            )
            if u < tile_uq:
                n_incl += 1
            else:
                n_excl += 1
        batch_imgs, batch_locs = [], []

    for idx, item in enumerate(wsi.build_generator(include_loc="grid")()):
        if max_tiles is not None and idx >= max_tiles:
            break
        batch_imgs.append(item["image"])
        batch_locs.append(item["loc"])
        if len(batch_imgs) == batch_size:
            flush()
    flush()
    log.info(
        f"Exported {n_incl} high-confidence / {n_excl} uncertain tiles "
        f"from {wsi.name}"
    )
    return n_incl, n_excl


class Heatmap:
    def __init__(
        self,
        slide: str,
        model: str,
        stride_div: int = 1,
        batch_size: Optional[int] = None,
        uq: bool = True,
        k: Optional[int] = None,
        qc: Optional[str] = None,
    ):
        """Compute grid predictions for one slide.

        Args:
            slide: path to the whole-slide image.
            model: path to a saved `..._epoch{E}` model dir, or an
                exported servable artifact (``*.biscuit`` — serving
                fleets need no checkpoint).
            stride_div: grid stride divisor (1 = non-overlapping).
        """
        import jax

        self.interface, tile_px, tile_um = _load_interface(model, k)
        batch_size = _auto_batch(batch_size, self.interface)
        self.wsi = WSI(
            slide, tile_px, tile_um, stride_div=stride_div, qc=qc
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
