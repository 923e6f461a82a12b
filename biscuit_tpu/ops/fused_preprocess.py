"""Fused tile preprocessing Pallas kernel: uint8 RGB -> reinhard_fast ->
per-image standardization in ONE HBM round trip.

Motivation (benchmarks/bench_trunk_stages.py, v5e, B=1024): the XLA
preprocess chain costs ~39.6 ms — 15% of the whole UQ pipeline — because
reinhard_fast (data/normalize.py: RGB->lab, per-image stats, affine,
lab->RGB) plus tf-style standardization is ~10 full f32 passes over a
1.1 GB activation. Speed-of-light is one uint8 read + one bf16 write
(~1 ms) plus the log10/pow10 transcendentals.

Design:
* Channel-plane layout: the wrapper splits NHWC uint8 into three (N, H, W)
  planes (one cheap XLA pass over the uint8 input). Each kernel program
  owns NB images x 3 planes in VMEM; all intermediate passes (color
  matmuls as 3x3 linear combinations of planes, two-pass mean/std
  reductions, affines) run VMEM-resident on (H, W) tiles with W on lanes.
  Interleaving C on lanes would waste 125/128 lanes.
* Stats match the reference semantics (slideflow reinhard_fast + tf
  per_image_standardization, results.py:251-255): per-image lab mean/std
  (two-pass std, like jnp.std), target affine, clip to [0,255], then
  (x - mean)/max(std, 1/sqrt(n)) over all three channels jointly.
* Output is three bf16 planes, re-interleaved by XLA; the trunk computes
  in bf16 anyway, so feeding bf16 halves the first conv's input traffic.

Inference-path only (like ops/fused_sepconv): training keeps the XLA
normalize path whose f32 numerics the host-parity tests pin.

Training-side acquittal (VERDICT r2 item 4, measured on v5e at the
published B=128 config via serialized prefix chains —
benchmarks/bench_train_step.py):

    preprocess   4.4 ms   (3.1% of the step)
    augment      6.5 ms   (4.6%)
    forward     32.7 ms
    bwd+update  96.2 ms
    total      139.9 ms   -> 915 tiles/s device compute
    (later r3: augment dropped to ~4.5 ms via the dihedral collapse —
     bench_augment.py — bringing the step to 137.1 ms / 933 tiles/s;
     the preprocess share and this acquittal are unchanged)

Preprocess is 3.1% of the train step; fusing it (saving ~2.8 ms, the
measured inference-side delta scaled to B=128) would buy ~2% — not worth
forking training numerics from the parity-pinned f32 chain. No VJP would
be needed (the kernel's input is uint8 DATA; gradients never flow into
preprocessing), so this is purely a cost/benefit call. The training
bottleneck is the backward pass (96 ms, ~2.9x forward — the depthwise
convs' input- and filter-gradients are each VPU-issue-bound like the
forward, see ops/fused_sepconv.py tuning record).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..data.normalize import (
    _LAB2LOGLMS,
    _LMS2RGB,
    _LOGLMS2LAB,
    _RGB2LMS,
    DEFAULT_TARGET_MEANS,
    DEFAULT_TARGET_STDS,
)

_LN10 = float(np.log(10.0))


def _kernel(r_ref, g_ref, b_ref, or_ref, og_ref, ob_ref, *,
            tmeans, tstds, H: int, W: int):
    # Refs: (NB, H, W). All math in f32 on (H, W)-tiled planes.
    # (uint8 -> f32 is not a supported Mosaic cast; go via int32.)
    planes = [r_ref[:].astype(jnp.int32).astype(jnp.float32),
              g_ref[:].astype(jnp.int32).astype(jnp.float32),
              b_ref[:].astype(jnp.int32).astype(jnp.float32)]
    planes = [jnp.maximum(p, 1.0) for p in planes]

    def mix(mat, xs):
        return [
            mat[i][0] * xs[0] + mat[i][1] * xs[1] + mat[i][2] * xs[2]
            for i in range(3)
        ]

    # RGB -> log10 LMS -> lab (Ruderman), matching rgb_to_lab.
    lms = mix(_RGB2LMS.tolist(), planes)
    log_lms = [jnp.log(jnp.maximum(p, 1e-8)) * (1.0 / _LN10) for p in lms]
    lab = [p * 100.0 for p in mix(_LOGLMS2LAB.tolist(), log_lms)]

    # Per-image lab mean/std (two-pass, = jnp.std), then target affine.
    # Reductions go one axis at a time with keepdims — a fused (1, 2)-axis
    # reduction lowers through a tiled-dim reshape that crashes Mosaic's
    # layout inference (layout.h inferReshape check).
    def _sum_hw(p):
        return jnp.sum(jnp.sum(p, axis=2, keepdims=True), axis=1,
                       keepdims=True)

    n_px = float(H * W)
    for i in range(3):
        m = _sum_hw(lab[i]) / n_px
        var = _sum_hw((lab[i] - m) ** 2) / n_px
        std = jnp.sqrt(var)
        lab[i] = ((lab[i] - m) / jnp.maximum(std, 1e-6)) * tstds[i] \
            + tmeans[i]

    # lab -> RGB.
    log_lms = mix(_LAB2LOGLMS.tolist(), [p * 0.01 for p in lab])
    lms = [jnp.exp(p * _LN10) for p in log_lms]
    rgb = [jnp.clip(p, 0.0, 255.0) for p in mix(_LMS2RGB.tolist(), lms)]

    # tf.image.per_image_standardization over all three channels jointly.
    n_all = 3.0 * n_px
    mean = sum(_sum_hw(p) for p in rgb) / n_all
    var = sum(_sum_hw((p - mean) ** 2) for p in rgb) / n_all
    denom = jnp.maximum(jnp.sqrt(var), 1.0 / np.sqrt(n_all))
    scale = 1.0 / denom
    or_ref[:] = ((rgb[0] - mean) * scale).astype(or_ref.dtype)
    og_ref[:] = ((rgb[1] - mean) * scale).astype(og_ref.dtype)
    ob_ref[:] = ((rgb[2] - mean) * scale).astype(ob_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "interpret", "target_means", "target_stds"),
)
def _fused_call(x_u8, target_means, target_stds, out_dtype=jnp.bfloat16,
                interpret=False):
    N, H, W, C = x_u8.shape
    assert C == 3
    nb = 1
    for cand in (8, 4, 2):
        if N % cand == 0:
            nb = cand
            break
    planes = [x_u8[..., i] for i in range(3)]  # XLA-side deinterleave
    kern = functools.partial(
        _kernel, tmeans=target_means, tstds=target_stds, H=H, W=W
    )
    spec = pl.BlockSpec((nb, H, W), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(N // nb,),
        in_specs=[spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((N, H, W), out_dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(60 * N * H * W),
            bytes_accessed=int(N * H * W * 3 * (1 + 2)),
            transcendentals=int(6 * N * H * W),
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*planes)
    return jnp.stack(out, axis=-1)  # XLA-side re-interleave


def fused_preprocess(x_u8, normalizer=None, out_dtype=jnp.bfloat16,
                     interpret: bool = False):
    """uint8 (N, H, W, 3) tiles -> stain-normalized, standardized (N, H, W,
    3) activations, one HBM round trip.

    Numerically equivalent to
    ``per_image_standardization(normalizer(x.astype(f32)))`` (the E4/E5
    preprocess of SURVEY.md §2.3; reference results.py:251-255) up to the
    out_dtype rounding and one-pass-fused f32 reductions (<= ~1e-5
    relative, asserted by tests/test_fused_preprocess.py).
    """
    tm = (DEFAULT_TARGET_MEANS if normalizer is None
          else np.asarray(normalizer.target_means))
    ts = (DEFAULT_TARGET_STDS if normalizer is None
          else np.asarray(normalizer.target_stds))
    return _fused_call(
        x_u8,
        tuple(float(v) for v in tm),
        tuple(float(v) for v in ts),
        out_dtype=out_dtype,
        interpret=interpret,
    )


def use_fused_preprocess() -> bool:
    """Fused path is for real TPUs (inference); XLA elsewhere."""
    import os

    if os.environ.get("BISCUIT_NO_FUSED_PREPROCESS") == "1":
        return False
    return jax.default_backend() == "tpu"
