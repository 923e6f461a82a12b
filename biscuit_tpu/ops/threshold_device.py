"""Device backend for the uncertainty-thresholding pipeline.

This module wires :mod:`biscuit_tpu.ops.roc_jax` into the production
threshold pipeline (BASELINE north star: "Port the slide-level
uncertainty-index aggregation, threshold search, and delong.py as jittable
ops so nested-UQ cross-validation runs end-to-end on a slice").
:func:`biscuit_tpu.threshold.detect` / ``apply`` dispatch here for large
frames (or when forced via ``backend='device'`` /
``BISCUIT_DEVICE_STATS=1``); behavior parity target is the host path,
which is itself parity-tested against /root/reference/biscuit/threshold.py
(detect 364-475, apply 248-361, process_group 180-245).

Architecture — the O(N)-in-tiles work runs on device, the O(groups) tail
runs through the host statistics code:

* Stage programs (padded to power-of-two row/segment buckets so nested-CV
  folds share compiled programs): the tile-prediction Youden search, the
  tile-uncertainty Youden search, and the tile->group segment reduction.
  Tile arrays stay resident on device across stages; only Youden candidate
  buffers and the (num_groups,)-sized group table return to the host.
* **Exact threshold resolution**: at an exact Youden-J tie the host (and
  the reference) pick an operating point decided by *float64 rounding
  noise* of ``tps/m - fps/n`` — unreproducible in f32. The device programs
  therefore return every near-optimal unpruned curve position with its
  exact integer (tps, fps) (:func:`roc_jax.youden_candidates_jax`) and
  :func:`_resolve_youden` re-evaluates J in float64 over that tiny set —
  bit-identical to ``stats.roc.youden_threshold`` including tie noise.
* Slide-level work (a few hundred to a few thousand groups) is executed by
  the host path's own logic on the device-computed group means, so every
  reference quirk (ROCFailedError conversion, the slide_uq=0.5 fallback,
  the uint8 label cast) is inherited rather than re-implemented.
* Group means use a two-pass compensated segment mean so float32 group
  statistics agree with the host's float64 pandas means to ~1 ulp.
* Degenerate *inputs* whose error behavior depends on host exception
  details (NaNs are re-raised identically; single-class tile labels,
  empty frames fall back) are screened before launch.

The host path stays the default for small frames: at a few hundred rows
program-launch overhead dwarfs the pandas cost, and matplotlib-bound calls
(``plot=True`` in ``detect``) take the host path because the figure needs
the full tile frame.

Known deviation (documented per SURVEY.md §2.2 convention): group means
are float32 (two-pass compensated, ~1 ulp of the f64 value). If two
groups' f64 mean scores differ by < f32 resolution (~6e-8) their order on
the slide-level ROC curve — and therefore a noise-level threshold choice —
can differ from the host path. Thresholds/AUCs remain within 1e-6.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import errors
from ..utils_log import log

__all__ = ["detect_device", "apply_device", "HostFallback"]

# Shared with the host module so the two backends can never drift on
# which threshold types dispatch where (import is safe: threshold.py
# only imports this module lazily inside functions).
from ..threshold import _FLOAT_TYPES  # noqa: E402
_CAND_K = 128


class HostFallback(Exception):
    """Internal: signal that this call must run on the host path (either
    for exact degenerate-case parity or because the device backend does
    not support an argument combination)."""


def _bucket(n: int, floor: int) -> int:
    """Smallest power-of-two >= max(n, floor) — the static pad size."""
    b = floor
    while b < n:
        b <<= 1
    return b


def _prepare(df, level):
    """Extract padded device arrays + segment ids from a tile frame.

    Returns (y_true, y_pred, uncertainty, seg_ids, mask, levels,
    num_segments) where arrays are padded to a row bucket and
    ``num_segments`` to a segment bucket. ``levels`` is the first-appearance
    group order (matches the host's ``pd.unique``; NaN keys get mask=0,
    the host's ``pd.notna`` filter)."""
    n = len(df)
    if n >= (1 << 24):
        # f32 integer-exact cumulative counts end at 2**24 rows.
        raise HostFallback("frame exceeds f32-exact row budget (2**24)")
    codes, levels = pd.factorize(df[level], use_na_sentinel=True)
    nseg = len(levels)
    rows = _bucket(n, 1024)
    segs = _bucket(max(nseg, 1), 8)

    def pad(v):
        out = np.zeros(rows, np.float32)
        out[:n] = v
        return out

    yt = pad(df["y_true"].to_numpy(np.float32))
    yp = pad(df["y_pred"].to_numpy(np.float32))
    u = pad(df["uncertainty"].to_numpy(np.float32))
    seg = np.zeros(rows, np.int32)
    seg[:n] = np.where(codes >= 0, codes, 0)
    # Tile-level stats run over every real row (host process_tile uses the
    # whole frame); only the group reduction drops NaN-keyed rows.
    mask = np.zeros(rows, np.float32)
    mask[:n] = 1.0
    keyed = np.zeros(rows, np.float32)
    keyed[:n] = (codes >= 0).astype(np.float32)
    return yt, yp, u, seg, mask, keyed, levels, segs


def _resolve_youden(cand) -> float:
    """Pick the operating point exactly as the host does.

    ``cand`` is the output of :func:`roc_jax.youden_candidates_jax`:
    every unpruned curve position within the f32 margin of the J maximum,
    with exact integer (tps, fps), in curve (descending-score) order.
    Re-evaluating ``tps/m - fps/n`` in float64 here reproduces the host's
    values bit-for-bit — including the rounding noise that decides exact-J
    ties — and argmax keeps the first occurrence, like np.argmax and the
    reference's ``max(zip(...))`` idiom. The leading (0, 0, +inf) curve
    origin (J = 0) is prepended, matching stats.roc.roc_curve.

    Raises ValueError for a single-class curve (host youden_threshold
    contract) and :class:`HostFallback` if the candidate buffer overflowed
    (pathological tie runs; the host path handles those).
    """
    import jax

    pulled = jax.device_get(cand)  # ONE device->host round trip
    m = float(pulled["m"])
    n = float(pulled["n"])
    if m <= 0 or n <= 0:
        raise ValueError("Youden J undefined: single-class ROC curve")
    count = int(pulled["count"])
    if count > _CAND_K:
        raise HostFallback(f"youden candidate overflow ({count})")
    keep = pulled["keep"][:count].astype(bool)
    tps = pulled["tps"][:count][keep].astype(np.float64)
    fps = pulled["fps"][:count][keep].astype(np.float64)
    score = pulled["score"][:count][keep].astype(np.float64)
    j = np.r_[0.0, tps / m - fps / n]
    score = np.r_[np.inf, score]
    return float(score[np.argmax(j)])


def _make_programs():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from .roc_jax import youden_candidates_jax

    @jax.jit
    def tile_pred_stage(yt, yp, mask):
        """Tile prediction-threshold search (threshold.py:143-152)."""
        return youden_candidates_jax(yt, yp, mask, k=_CAND_K)

    @jax.jit
    def tile_uq_stage(yt, yp, u, mask, tile_pred):
        """Incorrectness flags + tile-UQ threshold search
        (threshold.py:165-170, 409-426)."""
        wrong = ((yp < tile_pred) & (yt == 1)) | (
            (yp >= tile_pred) & (yt == 0))
        inc = jnp.where(wrong, 1.0, 0.0)
        out = youden_candidates_jax(inc, u, mask, k=_CAND_K)
        return out

    @partial(jax.jit, static_argnames=("num_segments", "tu_on"))
    def group_stage(yt, yp, u, seg, keyed, tile_uq, num_segments, tu_on):
        """Tile-UQ filter + tile->group segment reduction
        (threshold.py:189-204 on-chip). ``keyed`` excludes NaN-keyed and
        padded rows.

        The reduction is a one-hot matmul on the MXU, not segment_sum:
        XLA fuses the one-hot generation into the dot (never materializing
        the (N, num_segments) matrix) and the MXU runs it in ~13 ms at
        2M x 512 on v5e vs ~73 ms for the scatter-add-based segment_sum
        path. Precision.HIGHEST keeps f32 multiplies (the MXU default
        downcasts to bf16: measured 3.6e-5 mean error vs 3e-8 with
        HIGHEST + the two-pass residual correction)."""
        P = jax.lax.Precision.HIGHEST
        tmask = keyed * (u < tile_uq) if tu_on else keyed
        oh = jax.nn.one_hot(seg, num_segments, dtype=jnp.float32)
        m1 = jnp.stack([tmask, yp * tmask, yt * tmask, u * tmask])
        sums = jnp.matmul(m1, oh, precision=P)
        counts = sums[0]
        denom = jnp.maximum(counts, 1.0)
        first = sums[1:] / denom
        resid = jnp.stack([yp, yt, u]) - first[:, seg]
        means = first + jnp.matmul(resid * tmask, oh, precision=P) / denom
        gyp, gyt, gu = means[0], means[1], means[2]
        return {
            # uint8 label-cast parity with guarded floor (roc_jax.group_reduce
            # docstring: reciprocal-multiply division on TPU).
            "y_true": jnp.floor(gyt + 1e-6).astype(jnp.int32),
            "y_pred": gyp,
            "uncertainty": gu,
            "count": counts,
            "n_tiles": jnp.sum(tmask),
        }

    return tile_pred_stage, tile_uq_stage, group_stage


_programs_cache = None


def _programs():
    global _programs_cache
    if _programs_cache is None:
        _enable_persistent_compile_cache()
        _programs_cache = _make_programs()
    return _programs_cache


def _enable_persistent_compile_cache():
    """Point JAX at the on-disk compilation cache (same dir the test
    conftest uses) unless one is already configured or disabled via
    BISCUIT_NO_COMPILE_CACHE=1. Remote (tunnel) compiles of the stage
    programs run minutes; the disk cache makes them one-time per
    machine."""
    import os

    if os.environ.get("BISCUIT_NO_COMPILE_CACHE") == "1":
        return
    import jax

    if getattr(jax.config, "jax_compilation_cache_dir", None):
        return
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("BISCUIT_JAX_CACHE",
                       os.path.expanduser("~/.cache/biscuit_jax")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _precheck(df):
    """Degenerate-input screening, in host order. NaN predictions raise
    exactly like the host (threshold.py:136-138); inputs whose error
    behavior depends on host exception details fall back wholesale."""
    if not len(df):
        raise HostFallback("empty frame")
    y_pred = df["y_pred"].to_numpy()
    if np.isnan(y_pred).sum():
        raise errors.PredsContainNaNError
    y_true = df["y_true"].to_numpy()
    classes = np.unique(y_true)
    if classes.size > 2 or not np.all(np.isin(classes, (0, 1))):
        raise HostFallback("non-binary labels")
    if classes.size < 2:
        # Host: tile ROC warns + Youden ValueError -> 0.5 fallback etc.
        raise HostFallback("single-class tile labels")
    if df["uncertainty"].isna().any():
        raise HostFallback("NaN uncertainty")


def _tile_stages(df, tile_pred, tile_uq, level):
    """Shared device pipeline: resolve tile_pred, optionally detect
    tile_uq, filter, and reduce to the group table.

    Returns (tile_pred, tile_uq, tu_mode, group table dict of numpy
    arrays, levels). Group rows are in first-appearance order; only the
    first len(levels) entries are real."""
    import jax.numpy as jnp

    tp_stage, tu_stage, g_stage = _programs()
    yt, yp, u, seg, mask, keyed, levels, segs = _prepare(df, level)
    yt, yp, u = jnp.asarray(yt), jnp.asarray(yp), jnp.asarray(u)
    seg, mask, keyed = jnp.asarray(seg), jnp.asarray(mask), jnp.asarray(keyed)

    if tile_pred == "detect":
        # Host fallback to 0.5 on a single-class curve is unreachable here
        # (single-class frames are screened in _precheck).
        tile_pred = _resolve_youden(tp_stage(yt, yp, mask))
        log.debug(f"Auto-detected tile prediction threshold: {tile_pred:.4f}")

    if isinstance(tile_uq, _FLOAT_TYPES):
        tu_mode = "fixed"
    elif tile_uq == "detect":
        tu_mode = "detect"
        # ValueError on a single-class ROC(incorrect, uncertainty)
        # propagates to detect_device, which degrades to the
        # undetectable-fold return — the host detect()'s deliberate fix
        # of the reference's uncaught crash (threshold.py:423-424).
        tile_uq = _resolve_youden(
            tu_stage(yt, yp, u, mask, np.float32(tile_pred)))
        log.debug(f"Tile-level optimal UQ threshold: {tile_uq:.4f}")
    else:
        tu_mode = "off"

    g = g_stage(
        yt, yp, u, seg, keyed,
        np.float32(tile_uq if tu_mode != "off" else 0.0),
        num_segments=segs, tu_on=(tu_mode != "off"),
    )
    import jax

    g = jax.device_get(g)  # ONE round trip for the whole group table
    log.debug(f"Number of tiles after filter: {int(g['n_tiles'])}")
    return tile_pred, tile_uq, tu_mode, g, levels


def _group_frame(g, levels, level):
    """Host-side group table (first-appearance order, empty groups
    dropped) as float64 — the input to the host-logic tail."""
    n_real = len(levels)
    present = g["count"][:n_real] > 0
    return {
        "levels": np.asarray(levels)[present],
        "y_true": g["y_true"][:n_real][present].astype(np.uint8),
        "y_pred": g["y_pred"][:n_real][present].astype(np.float64),
        "uncertainty": g["uncertainty"][:n_real][present].astype(np.float64),
    }


def detect_device(df, tile_uq="detect", slide_uq="detect", tile_pred="detect",
                  slide_pred="detect", plot=False, patients=None):
    """Device counterpart of :func:`biscuit_tpu.threshold.detect`.

    Same return contract ((thresholds dict, slide AUC) or raising the same
    exceptions); raises :class:`HostFallback` when the call must run on
    host. ``patients`` only affects detect() via a column assignment on the
    host path (grouping is always slide-level), so it is accepted and
    ignored here. The frame is not mutated (the host path adds derived
    columns in place; no production caller relies on that side effect).

    The slide-level tail below inlines the host detect logic
    (threshold.py:300-341 of biscuit_tpu, mirroring reference
    threshold.py:428-475) over the device-computed group means.
    """
    from ..stats.roc import auc_score, roc_curve, youden_threshold

    if plot:
        raise HostFallback("plot requires the host tile frame")
    for v in (tile_pred, slide_pred):
        if v != "detect" and not isinstance(v, _FLOAT_TYPES + (int,)):
            raise HostFallback("non-numeric prediction threshold")
    _precheck(df)

    if not isinstance(tile_uq, _FLOAT_TYPES) and tile_uq != "detect":
        log.debug("Not performing tile-level uncertainty thresholding.")
        tile_uq = None

    empty_thresh = {k: None for k in (
        "tile_uq", "slide_uq", "tile_pred", "slide_pred")}
    try:
        tile_pred, tile_uq_res, tu_mode, g, levels = _tile_stages(
            df, tile_pred, tile_uq, "slide")
    except ValueError:
        # Single-class error ROC in the tile-UQ stage: mirror the host
        # detect()'s deliberate degrade (threshold.py — undetectable
        # fold, skipped by from_cv) so the two backends stay
        # behavior-identical.
        log.error("Unable to detect tile UQ threshold "
                  "(single-class error ROC)")
        return empty_thresh, None
    tile_uq = tile_uq_res if tu_mode != "off" else None
    gf = _group_frame(g, levels, "slide")
    gyt = gf["y_true"]
    gyp = gf["y_pred"]
    gu = gf["uncertainty"]

    # --- host-logic tail: process_group_predictions (threshold.py:100-158)
    if not len(gyt):
        log.error("Unable to process slide predictions")
        return empty_thresh, None
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        l_fpr, l_tpr, l_thresh = roc_curve(gyt, gyp)
    if slide_pred == "detect":
        try:
            slide_pred = youden_threshold(l_fpr, l_tpr, l_thresh)
        except ValueError:
            log.error("Unable to process slide predictions")
            return empty_thresh, None
        log.debug(f"Using detected prediction threshold: {slide_pred:.4f}")

    s_incorrect = (
        ((gyp < slide_pred) & (gyt == 1)) | ((gyp >= slide_pred) & (gyt == 0))
    ).astype(int)

    # --- host-logic tail: detect (threshold.py:308-341)
    if slide_uq == "detect":
        if not s_incorrect.sum():
            log.debug(
                "Unable to calculate slide UQ threshold; "
                "no incorrect predictions made"
            )
            slide_uq = None
            keep = np.ones(gyt.shape, bool)
        else:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                s_fpr, s_tpr, s_thresh = roc_curve(s_incorrect, gu)
            try:
                slide_uq = youden_threshold(s_fpr, s_tpr, s_thresh)
            except ValueError:
                # All-incorrect slide error ROC: same deliberate degrade
                # as the host detect()'s slide branch.
                log.error("Unable to detect slide UQ threshold "
                          "(single-class error ROC)")
                return empty_thresh, None
            log.debug(f"Slide-level optimal UQ threshold: {slide_uq:.4f}")
            keep = gu < slide_uq
    else:
        log.debug("Not performing slide-level uncertainty thresholding.")
        slide_uq = 0.5  # reference quirk (threshold.py:461-463)
        keep = np.ones(gyt.shape, bool)

    auc = auc_score(gyt[keep], gyp[keep])
    thresholds = {
        "tile_uq": tile_uq,
        "slide_uq": slide_uq,
        "tile_pred": tile_pred,
        "slide_pred": slide_pred,
    }
    return thresholds, auc


def apply_device(df, tile_uq, slide_uq, tile_pred=0.5, slide_pred=0.5,
                 plot=False, keep="high_confidence", title=None,
                 patients=None, level="slide"):
    """Device counterpart of :func:`biscuit_tpu.threshold.apply`.

    Same return contract (results dict, thresholded group DataFrame). The
    group table is reconstructed host-side from the device segment
    reduction, and the group-level tail inlines the host apply logic
    (threshold.py:210-240 of biscuit_tpu, reference threshold.py:310-361)
    so columns, ordering, and quirks match. Raises :class:`HostFallback`
    for argument combinations whose host behavior is exception-driven."""
    from ..stats.roc import auc_score

    assert keep in ("high_confidence", "low_confidence")
    assert not (level == "patient" and patients is None)
    if slide_pred == "detect" or not isinstance(
        slide_pred, _FLOAT_TYPES + (int,)
    ):
        # Host path crashes downstream on non-numeric slide_pred
        # (float > str); don't mask that contract here.
        raise HostFallback("non-numeric slide_pred")
    if tile_pred != "detect" and not isinstance(
        tile_pred, _FLOAT_TYPES + (int,)
    ):
        raise HostFallback("non-numeric tile_pred")
    # apply()'s host semantics for the uq thresholds are plain
    # truthiness (`if tile_uq: df[df.uncertainty < tile_uq]`): ints
    # filter like floats, and truthy NON-numbers (e.g. the string
    # 'detect', valid only for detect()) crash in the comparison — fall
    # back so the host raises its own TypeError rather than this path
    # silently inventing different semantics.
    _num = _FLOAT_TYPES + (int, np.integer)
    if tile_uq and not isinstance(tile_uq, _num):
        raise HostFallback("non-numeric truthy tile_uq")
    if slide_uq and not isinstance(slide_uq, _num):
        raise HostFallback("non-numeric truthy slide_uq")
    _precheck(df)

    if patients:
        df = df.assign(patient=df["slide"].map(patients))
    # Host pre-filter denominator counts NaN keys too (pd.unique keeps one
    # NaN entry); group stats then exclude them (pd.notna).
    num_pre_filter = df[level].nunique(dropna=False)
    if tile_uq:
        log.debug(f"Applying tile UQ threshold of {tile_uq:.5f}")

    # Reference truthiness: 0/None tile_uq skips the filter; ints
    # coerce to float so _tile_stages' fixed-threshold branch applies.
    tile_pred, _, _, g, levels = _tile_stages(
        df, tile_pred, float(tile_uq) if tile_uq else None, level)
    gf = _group_frame(g, levels, level)
    gyt = gf["y_true"]
    gyp = gf["y_pred"]
    gu = gf["uncertainty"]

    if not len(gyt):
        log.error("Unable to process slide predictions")
        empty = {k: None for k in (
            "auc", "percent_incl", "acc", "sensitivity", "specificity")}
        return empty, None

    # Thresholds are data values (a Youden optimum IS one of the group
    # scores); group means here are f32. Round the incoming thresholds to
    # f32 so the boundary group — the one the threshold came from — is
    # excluded by the strict '<' exactly as on the host path. This makes
    # detect->apply self-consistent within a backend (module docstring).
    slide_pred = float(np.float32(slide_pred))
    if slide_uq:
        slide_uq = float(np.float32(slide_uq))

    # --- host-logic tail: process_group_predictions output frame
    correct = ((gyp < slide_pred) & (gyt == 0)) | (
        (gyp >= slide_pred) & (gyt == 1))
    s_df = pd.DataFrame({
        level: pd.Series(gf["levels"]),
        "error": pd.Series(np.abs(gyt - gyp)),
        "uncertainty": pd.Series(gu),
        "correct": pd.Series(correct),
        "incorrect": pd.Series(~correct).astype(int),
        "y_true": pd.Series(gyt),
        "y_pred": pd.Series(gyp),
        "y_pred_bin": pd.Series(gyp >= slide_pred).astype(int),
    })

    if plot:
        from ..threshold import plot_uncertainty

        plot_uncertainty(s_df, threshold=slide_uq, kind=level, title=title)

    # --- host-logic tail: apply (threshold.py:213-240)
    if slide_uq:
        log.debug(f"Using {level} uncertainty threshold of {slide_uq:.5f}")
        if keep == "high_confidence":
            s_df = s_df.loc[s_df["uncertainty"] < slide_uq]
        else:
            s_df = s_df.loc[s_df["uncertainty"] >= slide_uq]

    auc = auc_score(s_df["y_true"].to_numpy(), s_df["y_pred"].to_numpy())
    percent_incl = len(s_df) / num_pre_filter
    y_true_b = s_df["y_true"].to_numpy().astype(bool)
    y_pred_b = s_df["y_pred"].to_numpy() > slide_pred
    tp = np.logical_and(y_true_b, y_pred_b).sum()
    fp = np.logical_and(~y_true_b, y_pred_b).sum()
    tn = np.logical_and(~y_true_b, ~y_pred_b).sum()
    fn = np.logical_and(y_true_b, ~y_pred_b).sum()
    with np.errstate(invalid="ignore", divide="ignore"):
        acc = (tp + tn) / (tp + tn + fp + fn)
        sensitivity = tp / (tp + fn)
        specificity = tn / (tn + fp)
    results = {
        "auc": auc,
        "percent_incl": percent_incl,
        "acc": acc,
        "sensitivity": sensitivity,
        "specificity": specificity,
    }
    return results, s_df
