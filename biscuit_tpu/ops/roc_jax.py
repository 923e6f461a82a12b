"""Jittable ROC / AUC / Youden threshold search and segment reductions.

BASELINE.json north star: "Port the slide-level uncertainty-index
aggregation, biscuit/threshold.py tile/slide threshold search, and delong.py
AUC comparison as jittable ops so nested-UQ cross-validation runs end-to-end
on a v4/v5e slice."

These are the on-chip counterparts of :mod:`biscuit_tpu.stats.roc` (which
keeps sklearn-bitwise semantics on host). Design notes for XLA:

* static shapes — thresholds are evaluated at every sample position with
  duplicate-score positions masked to -inf J, which reproduces sklearn's
  distinct-threshold collapse for the argmax (the optimal operating point
  is always a run boundary);
* AUC via the rank statistic (Mann-Whitney) with midranks for ties — exactly
  the trapezoid ROC AUC, in one sort;
* group (slide/patient) means via segment sums keyed on integer slide ids
  with a static ``num_segments`` — the map-reduce the reference does in
  pandas (threshold.py:189-204), but fused into the inference program so
  tile->slide aggregation happens before leaving the chip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "auc_jax",
    "youden_threshold_jax",
    "youden_candidates_jax",
    "uncertainty_threshold_jax",
    "segment_mean",
    "group_reduce",
    "apply_thresholds_jax",
]


def _midranks(x: jnp.ndarray) -> jnp.ndarray:
    """Midranks (average 1-based rank over ties) of a 1-D array."""
    n = x.shape[0]
    order = jnp.argsort(x, stable=True)
    z = x[order]
    # For each position, rank range of its tie-run: first and last index.
    idx = jnp.arange(n)
    is_start = jnp.concatenate([jnp.array([True]), z[1:] != z[:-1]])
    is_end = jnp.concatenate([z[1:] != z[:-1], jnp.array([True])])
    # Run boundaries via cumsum-rank + sort + gather, not
    # maximum.accumulate (quadratic reduce_window on TPU — see
    # youden_candidates_jax). Every position lies inside a run, so the
    # rank indices are always in range.
    sidx = jnp.sort(jnp.where(is_start, idx, n))
    start_idx = sidx[jnp.cumsum(is_start.astype(jnp.int32)) - 1]
    eidx = jnp.sort(jnp.where(is_end, idx, n))
    end_idx = eidx[jnp.cumsum(is_end.astype(jnp.int32)) - is_end]
    mid = 0.5 * (start_idx + end_idx) + 1.0
    out = jnp.zeros(n, x.dtype if jnp.issubdtype(x.dtype, jnp.floating)
                    else jnp.float32)
    return out.at[order].set(mid)


@jax.jit
def auc_jax(y_true: jnp.ndarray, y_score: jnp.ndarray,
            mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """AUROC via the rank statistic (ties get midranks). Optional mask for
    padded rows. NaN when a class is absent (matching host semantics)."""
    y_true = y_true.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones_like(y_true)
    mask = mask.astype(jnp.float32)
    # Push masked rows to -inf so they rank lowest, then subtract their
    # contribution: simpler — give masked rows score -inf and y_true 0,
    # then correct m/n counts.
    score = jnp.where(mask > 0, y_score, -jnp.inf)
    ranks = _midranks(score)
    m = jnp.sum(y_true * mask)          # positives
    n = jnp.sum((1.0 - y_true) * mask)  # negatives
    # Masked rows occupy the lowest ranks; positive ranks are unaffected
    # in relative terms after subtracting the offset of masked count? No:
    # midranks of valid rows shift by the number of masked rows ranked
    # below them (all of them). Sum over positives:
    pad = jnp.sum(1.0 - mask)
    sum_pos_ranks = jnp.sum(ranks * y_true * mask) - pad * m
    auc = (sum_pos_ranks - m * (m + 1.0) / 2.0) / (m * n)
    return jnp.where((m > 0) & (n > 0), auc, jnp.nan)


def _cum_curve(y_true, y_score, mask):
    """Shared prefix: descending-sorted cumulative tps/fps with duplicate
    and padded positions flagged. Returns (tps, fps, sorted_scores, valid,
    sorted_mask)."""
    y_true = y_true.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    score = jnp.where(mask > 0, y_score, -jnp.inf)
    order = jnp.argsort(-score, stable=True)
    s = score[order]
    t = (y_true * mask)[order]
    v = mask[order]
    tps = jnp.cumsum(t)
    fps = jnp.cumsum(v) - tps
    # A position is a valid threshold only if it's the LAST of its score run
    # and not padding.
    n = s.shape[0]
    is_last = jnp.concatenate([s[:-1] != s[1:], jnp.array([True])])
    valid = is_last & (v > 0)
    return tps, fps, s, valid, v


@jax.jit
def youden_threshold_jax(y_true, y_score, mask=None):
    """Optimal threshold via Youden's J with sklearn's distinct-threshold
    semantics and first-occurrence tie-breaking. Returns (threshold, auc_j)
    where auc_j is J at the optimum."""
    if mask is None:
        mask = jnp.ones(y_score.shape, jnp.float32)
    tps, fps, s, valid, _v = _cum_curve(y_true, y_score, mask)
    m = tps[-1]
    n = fps[-1]
    tpr = tps / jnp.maximum(m, 1.0)
    fpr = fps / jnp.maximum(n, 1.0)
    j = jnp.where(valid, tpr - fpr, -jnp.inf)
    best = jnp.argmax(j)
    # sklearn's curve starts at (fpr=0, tpr=0, threshold=+inf) with J=0;
    # when no sample threshold beats J=0 the host picks that origin point
    # (first occurrence). Mirror it: non-positive best J -> +inf threshold.
    thr = jnp.where(j[best] > 0, s[best], jnp.inf)
    jval = jnp.maximum(j[best], 0.0)
    return thr, jval


@partial(jax.jit, static_argnames=("k",))
def youden_candidates_jax(y_true, y_score, mask=None, k: int = 128):
    """Near-optimal Youden operating points with exact integer curve counts.

    The pure-device :func:`youden_threshold_jax` picks the argmax of a
    float32 J — at an *exact* J tie, the host/sklearn pick is decided by
    float64 rounding noise of ``tps/m - fps/n`` (the reference's
    ``max(zip(tpr, fpr), key=...)`` idiom, threshold.py:145-152), which
    float32 cannot reproduce. This op instead returns every unpruned curve
    position whose f32 J is within ``_J_MARGIN`` of the maximum (a strict
    superset of all exact ties: true-J gaps between distinct integer count
    pairs are >= 1/(m*n) >> f64 noise, and f32 evaluation noise of J is
    < 1e-6), with the integer ``tps``/``fps`` at each. The caller then
    re-evaluates J in float64 over this tiny set and applies argmax with
    first-occurrence — bit-identical to the host including noise-level tie
    resolution (see threshold_device._resolve_youden).

    sklearn's ``drop_intermediate`` pruning is replicated (collinear
    interior points are excluded) because a pruned position can tie the
    maximum and must not be selectable: each returned candidate carries a
    ``keep`` flag (False = pruned) the caller filters on.

    Counts are exact in f32 for n <= 2**24 rows.

    Returns dict: tps/fps/score/keep (k,), count (selected positions
    INCLUDING pruned ones — overflow indicator only), m, n. Positions
    beyond k are dropped (caller checks count <= k).
    """
    if mask is None:
        mask = jnp.ones(y_score.shape, jnp.float32)
    tps, fps, s, valid, v = _cum_curve(y_true, y_score, mask)
    n_rows = s.shape[0]
    m = tps[-1]
    n = fps[-1]

    # TPU cost discipline: everything below is argsort/cumsum (already in
    # _cum_curve), one int sort, and K-sized gathers/searchsorteds. NO
    # scatters (serialize on the scalar core: ~4 us/row) and NO
    # jnp.*.accumulate (lowers to a quadratic reduce_window: measured
    # ~7.5 s at 2M rows).
    #
    # J maximum over valid positions. Pruned (collinear-interior)
    # positions never carry a strict maximum — on a straight run J is
    # linear, so run endpoints bound it — hence jmax over valid equals
    # jmax over the pruned curve and pruning can be deferred to the
    # candidate set.
    idx = jnp.arange(n_rows)
    j = tps / jnp.maximum(m, 1.0) - fps / jnp.maximum(n, 1.0)
    jmax = jnp.max(jnp.where(valid, j, -jnp.inf))
    sel = valid & (j >= jmax - _J_MARGIN)
    # First k selected positions, in curve order, WITHOUT a scatter:
    # selected rows sort to the front; the rest sort to n_rows (clamped
    # gather reads row 0, discarded host-side via count).
    pos = jnp.sort(jnp.where(sel, idx, n_rows))[:k]
    posc = jnp.clip(pos, 0, n_rows - 1)

    # sklearn drop_intermediate, evaluated ONLY at the k candidates: keep
    # a candidate unless both second differences w.r.t. its compressed
    # (valid-position) neighbors vanish. Candidates are run ends, so the
    # previous valid position is run_start-1 and the next valid position
    # is the end of the following run — both found with binary searches
    # on the ascending key t = -s.
    t = -s
    tc = t[posc]
    run_start = jnp.searchsorted(t, tc, side="left")
    nxt_val = t[jnp.clip(posc + 1, 0, n_rows - 1)]
    nxt_end = jnp.searchsorted(t, nxt_val, side="right") - 1
    prev = run_start - 1
    next_valid = (posc + 1 < n_rows) & (v[jnp.clip(posc + 1, 0, n_rows - 1)]
                                        > 0)
    has_both = (prev >= 0) & next_valid
    pc = jnp.clip(prev, 0, n_rows - 1)
    nc = jnp.clip(nxt_end, 0, n_rows - 1)
    d2f = fps[nc] - 2.0 * fps[posc] + fps[pc]
    d2t = tps[nc] - 2.0 * tps[posc] + tps[pc]
    keep = jnp.where(has_both, (d2f != 0.0) | (d2t != 0.0), True)

    return {
        "tps": tps[posc], "fps": fps[posc], "score": s[posc], "keep": keep,
        "count": jnp.sum(sel.astype(jnp.int32)), "m": m, "n": n,
    }


_J_MARGIN = 1e-5


@jax.jit
def uncertainty_threshold_jax(incorrect, uncertainty, mask=None):
    """The reference's UQ threshold detection (threshold.py:417-426):
    Youden-J point of ROC(incorrect, uncertainty)."""
    return youden_threshold_jax(incorrect, uncertainty, mask)


@partial(jax.jit, static_argnames=("num_segments",))
def segment_mean(values, segment_ids, num_segments: int, mask=None):
    """Per-segment means with optional row mask; empty segments -> NaN."""
    if mask is None:
        mask = jnp.ones(values.shape[0], jnp.float32)
    mask = mask.astype(values.dtype)
    sums = jax.ops.segment_sum(values * mask, segment_ids, num_segments)
    counts = jax.ops.segment_sum(mask, segment_ids, num_segments)
    return sums / jnp.maximum(counts, 1.0), counts


@partial(jax.jit, static_argnames=("num_segments",))
def group_reduce(y_true, y_pred, uncertainty, segment_ids,
                 num_segments: int, mask=None):
    """Tile -> group aggregation (threshold.py:189-204 on-chip): group-mean
    y_pred / y_true / uncertainty. Returns dict of (num_segments,) arrays
    plus per-group tile counts."""
    if mask is None:
        mask = jnp.ones(y_pred.shape[0], jnp.float32)
    yp, counts = segment_mean(y_pred, segment_ids, num_segments, mask)
    yt, _ = segment_mean(y_true.astype(jnp.float32), segment_ids,
                         num_segments, mask)
    u, _ = segment_mean(uncertainty, segment_ids, num_segments, mask)
    return {
        # uint8 cast parity with the reference (threshold.py:197-200).
        # The +1e-6 guards against TPU's reciprocal-multiply division:
        # under jit, sum/count for a pure group can land at 0.99999994 and
        # a bare floor would corrupt the group label.
        "y_true": jnp.floor(yt + 1e-6).astype(jnp.int32),
        "y_pred": yp,
        "uncertainty": u,
        "count": counts,
    }


def _masked_midranks(score, select, within):
    """Midranks of ``score[within]`` restricted to the ``select`` subset,
    evaluated pairwise (O(n^2)) — DeLong runs at slide/patient scale
    (hundreds to thousands of groups), where a pairwise matrix is trivial
    for the VPU and avoids dynamic shapes entirely.

    rank_i = #[j in subset : s_j < s_i] + (#[j in subset : s_j == s_i]+1)/2
    """
    s_i = score[:, None]
    s_j = score[None, :]
    sel = (select * within).astype(jnp.float32)[None, :]
    less = jnp.sum((s_j < s_i) * sel, axis=1)
    equal = jnp.sum((s_j == s_i) * sel, axis=1)
    return less + (equal + 1.0) / 2.0


@jax.jit
def delong_variance_jax(y_true, y_score, mask=None):
    """(AUC, DeLong variance) for one classifier — the jittable counterpart
    of delong.delong_roc_variance (Sun & Xu 2014 fast DeLong). Static
    shapes; optional mask for padded rows."""
    y_true = y_true.astype(jnp.float32)
    y_score = y_score.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones_like(y_true)
    mask = mask.astype(jnp.float32)
    pos = y_true * mask
    neg = (1.0 - y_true) * mask
    m = jnp.sum(pos)
    n = jnp.sum(neg)

    tx = _masked_midranks(y_score, pos, mask)   # ranks among positives
    ty = _masked_midranks(y_score, neg, mask)   # ranks among negatives
    tz = _masked_midranks(y_score, mask, mask)  # ranks among all valid

    auc = (jnp.sum(tz * pos) - m * (m + 1.0) / 2.0) / (m * n)
    # Structural components (Sun & Xu eq. 5-6).
    v01 = (tz - tx) / n          # defined at positive positions
    v10 = 1.0 - (tz - ty) / m    # defined at negative positions
    mean01 = jnp.sum(v01 * pos) / m
    mean10 = jnp.sum(v10 * neg) / n
    s01 = jnp.sum(((v01 - mean01) ** 2) * pos) / jnp.maximum(m - 1.0, 1.0)
    s10 = jnp.sum(((v10 - mean10) ** 2) * neg) / jnp.maximum(n - 1.0, 1.0)
    var = s01 / m + s10 / n
    return auc, var


@jax.jit
def delong_test_jax(y_true, score_a, score_b, mask=None):
    """log10 p-value that two paired classifiers have different AUCs — the
    jittable counterpart of delong.delong_roc_test."""
    y_true = y_true.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones_like(y_true)
    mask = mask.astype(jnp.float32)
    pos = y_true * mask
    neg = (1.0 - y_true) * mask
    m = jnp.sum(pos)
    n = jnp.sum(neg)

    aucs = []
    v01s, v10s = [], []
    for s in (score_a.astype(jnp.float32), score_b.astype(jnp.float32)):
        tx = _masked_midranks(s, pos, mask)
        ty = _masked_midranks(s, neg, mask)
        tz = _masked_midranks(s, mask, mask)
        aucs.append((jnp.sum(tz * pos) - m * (m + 1.0) / 2.0) / (m * n))
        v01s.append((tz - tx) / n)
        v10s.append(1.0 - (tz - ty) / m)

    def cov(u, v, sel, count):
        mu = jnp.sum(u * sel) / count
        mv = jnp.sum(v * sel) / count
        return jnp.sum((u - mu) * (v - mv) * sel) / jnp.maximum(
            count - 1.0, 1.0
        )

    s01 = jnp.array(
        [[cov(v01s[a], v01s[b], pos, m) for b in range(2)] for a in range(2)]
    )
    s10 = jnp.array(
        [[cov(v10s[a], v10s[b], neg, n) for b in range(2)] for a in range(2)]
    )
    sigma = s01 / m + s10 / n
    contrast = jnp.array([1.0, -1.0])
    var = contrast @ sigma @ contrast
    z = jnp.abs(aucs[0] - aucs[1]) / jnp.sqrt(var)
    # log10(2 * (1 - Phi(z))) via the complementary error function.
    log_sf = jnp.log(0.5 * jax.scipy.special.erfc(z / jnp.sqrt(2.0)))
    return jnp.log10(2.0) + log_sf / jnp.log(10.0)


@partial(jax.jit, static_argnames=("num_segments",))
def apply_thresholds_jax(
    y_true, y_pred, uncertainty, segment_ids, num_segments: int,
    tile_uq, slide_uq, tile_pred, slide_pred, mask=None,
):
    """On-chip threshold.apply (threshold.py:248-361): tile-UQ filter ->
    group means -> slide-UQ filter (high-confidence keep) -> AUC/acc/sens/
    spec/percent_incl. Fully fused: one program per evaluation."""
    if mask is None:
        mask = jnp.ones(y_pred.shape[0], jnp.float32)
    mask = mask.astype(jnp.float32)
    pre_groups_present = (
        jax.ops.segment_sum(mask, segment_ids, num_segments) > 0
    )
    keep_tiles = mask * (uncertainty < tile_uq)
    g = group_reduce(y_true, y_pred, uncertainty, segment_ids, num_segments,
                     keep_tiles)
    has_tiles = g["count"] > 0
    keep_groups = has_tiles & (g["uncertainty"] < slide_uq)
    gmask = keep_groups.astype(jnp.float32)

    auc = auc_jax(g["y_true"].astype(jnp.float32), g["y_pred"], gmask)
    yt = g["y_true"] > 0
    yp = g["y_pred"] > slide_pred
    tp = jnp.sum(gmask * (yt & yp))
    fp = jnp.sum(gmask * (~yt & yp))
    tn = jnp.sum(gmask * (~yt & ~yp))
    fn = jnp.sum(gmask * (yt & ~yp))
    total = jnp.maximum(tp + tn + fp + fn, 1.0)
    return {
        "auc": auc,
        "percent_incl": jnp.sum(gmask) / jnp.maximum(
            jnp.sum(pre_groups_present.astype(jnp.float32)), 1.0
        ),
        "acc": (tp + tn) / total,
        "sensitivity": tp / jnp.maximum(tp + fn, 1.0),
        "specificity": tn / jnp.maximum(tn + fp, 1.0),
    }
