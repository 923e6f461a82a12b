"""Pallas depthwise 3x3 convolution — experimental trunk-bottleneck study.

Motivation (measured on v5e, B=256): at the Xception middle-flow site
(19x19x728) XLA's depthwise conv takes ~3.4 ms while the adjacent MXU
pointwise conv takes 0.61 ms at 161 TFLOPs; the 16 middle-flow depthwise
convs dominate trunk wall time (~50 of 84 ms) at ~10x off their
HBM-bandwidth speed-of-light.

STATUS — correct but not yet faster than XLA. Three layouts were measured
(grid-per-image padded-scratch NHWC: 4.8 ms; roll-and-mask over flattened
spatial: 5.2 ms; HWNC with untiled leading spatial dims: 4.6 ms, all
bit-exact vs XLA's 3.4 ms). The op is vector-issue-bound, not HBM-bound:
with batch in sublanes the innermost (8, C) tiles issue ~10M VPU
instructions per call. Beating XLA requires fusing the depthwise into the
following pointwise matmul (one HBM round trip, dw on VPU overlapped with
pw on MXU) in a middle-flow-resident HWNC layout — tracked as the main
round-2 perf project. The kernel is kept (with its custom_vjp) as the
starting point; the model currently uses XLA's conv.

    out[h, w, c] = sum_{dy, dx} x[h+dy-1, w+dx-1, c] * k[dy, dx, c]

Stride-1 SAME only (all Xception depthwise convs are stride 1; the strided
ops are maxpools and residual 1x1 convs). Training support via custom_vjp:
dx reuses this kernel with a spatially flipped kernel; dk is nine
multiply-reduce contractions left to XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_kernel(x_ref, k_ref, out_ref, *, H: int, W: int, NB: int):
    # x_ref: (NB, H*W, C); k_ref: (9, C) f32; out_ref: (NB, H*W, C).
    # Nine rolled multiply-accumulates along the flattened spatial axis with
    # edge masks — no padded scratch, one read + one write per element.
    hw = H * W
    c = x_ref.shape[-1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
    row = pos // W
    col = pos - row * W

    x = x_ref[:].astype(jnp.float32)
    acc = jnp.zeros((NB, hw, c), jnp.float32)
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            # out[p] += x[p + dy*W + dx] * k  where the source is in-bounds.
            shift = dy * W + dx
            # pltpu.roll requires a non-negative shift; rolling by hw-shift
            # is the same circular rotation.
            src = pltpu.roll(x, (-shift) % hw, 1) if shift else x
            valid = (
                (row + dy >= 0) & (row + dy < H)
                & (col + dx >= 0) & (col + dx < W)
            ).astype(jnp.float32)
            tap = k_ref[(dy + 1) * 3 + (dx + 1)][None, None, :]
            acc += src * (valid[None] * tap)
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def _dw_call(x2, k9, h, w, interpret=False):
    # x2: (N, H*W, C)
    n, hw, c = x2.shape
    # Pick images-per-block so a block stays well under VMEM while keeping
    # enough work per program (bandwidth-bound op).
    bytes_per_img = hw * c * (x2.dtype.itemsize + 4 + x2.dtype.itemsize)
    nb = max(1, min(n, int(24 * 1024 * 1024 // max(bytes_per_img, 1))))
    while n % nb:
        nb -= 1
    return pl.pallas_call(
        functools.partial(_dw_kernel, H=h, W=w, NB=nb),
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * hw * c,
            bytes_accessed=2 * n * hw * c * x2.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x2, k9)


def _dw_forward(x, kernel, interpret=False):
    """x: (N, H, W, C); kernel: (3, 3, 1, C) or (3, 3, C)."""
    n, h, w, c = x.shape
    k = kernel.reshape(3, 3, -1).reshape(9, -1).astype(jnp.float32)
    out = _dw_call(x.reshape(n, h * w, c), k, h, w, interpret=interpret)
    return out.reshape(n, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def depthwise_conv3x3(x, kernel, interpret=False):
    """Depthwise 3x3, stride 1, SAME padding, NHWC; Pallas on TPU.

    Args:
        x: (N, H, W, C) activation (bf16 or f32).
        kernel: (3, 3, 1, C) HWIO depthwise filter (as flax stores it).
    """
    return _dw_forward(x, kernel, interpret)


def _fwd(x, kernel, interpret):
    return _dw_forward(x, kernel, interpret), (x, kernel)


def _bwd(interpret, res, g):
    x, kernel = res
    # dL/dx: correlate g with the spatially flipped kernel (same op).
    k_flipped = kernel.reshape(3, 3, 1, -1)[::-1, ::-1]
    dx = _dw_forward(g.astype(x.dtype), k_flipped, interpret).astype(x.dtype)
    # dL/dk[dy,dx,c] = sum_{n,h,w} x_pad[h+dy, w+dx, c] * g[n,h,w,c]
    n, h, w, c = x.shape
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    gf = g.astype(jnp.float32)
    taps = []
    for dy in range(3):
        row = []
        for dxi in range(3):
            row.append(
                jnp.sum(xp[:, dy:dy + h, dxi:dxi + w, :] * gf, axis=(0, 1, 2))
            )
        taps.append(jnp.stack(row))
    dk = jnp.stack(taps).reshape(3, 3, 1, c).astype(kernel.dtype)
    return dx, dk


depthwise_conv3x3.defvjp(_fwd, _bwd)


def use_pallas_depthwise() -> bool:
    """Pallas path is for real TPUs; XLA's conv elsewhere."""
    return jax.default_backend() == "tpu"
