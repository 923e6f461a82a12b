"""Fused strided Xception block Pallas kernel (entry/exit flows).

After the middle flow was fused (ops/fused_sepconv.py), the prefix-delta
stage bench (benchmarks/bench_trunk_stages.py, v5e B=1024) showed the entry
flow as the next bottleneck: ~117 ms of the 263 ms UQ pipeline, almost all
of it HBM passes over the big early activations (150^2 x 128 is 5.9 GB per
pass at B=1024; the XLA path makes ~8 such passes per block). This kernel
computes ONE WHOLE strided Xception block —

    [relu?] -> sepconv(dw 3x3 + pw 1x1) -> BN -> relu -> sepconv -> BN
    -> maxpool 3x3 stride 2 (SAME) -> (+) residual 1x1 stride-2 conv + BN

— reading the input activation ~once and writing the half-resolution
output once (reference architecture: Keras Xception blocks 2-4 and 13;
models/xception.py XceptionBlock).

Design (extends the middle-flow HWNC recipe to strided blocks):
* Layout (G, H, W, NB=8, C) with G = N/NB image groups: spatial dims
  untiled, (images, channels) on the (sublane, lane) tiles. Depthwise
  taps and pool windows are statically shifted reads; stride-2
  subsampling is a free reshape on untiled dims ((W) -> (W/2, 2), take
  index 0) — no strided vector ops anywhere.
* Grid (G, S): S H-strips of hs rows (hs % 6 == 0). Each program reads
  its strip via the normal BlockSpec pipeline plus two 3-row halo blocks
  above/below (so each row is read ~1.25x, not 3x). Out-of-image halo
  rows are zeroed with an iota row mask — exact SAME conv padding; y1
  rows outside the image are masked to -inf before the maxpool. Ragged
  last strips rely on Pallas's partial-block semantics (reads of
  out-of-bounds block regions are masked off, out-of-bounds writes
  dropped).
* Within a strip, the sep0 -> sep1 -> pool -> residual pipeline runs on
  values (vector registers + compiler-managed spills — scratch-buffer
  intermediates made VMEM traffic the bottleneck); pointwise convs and
  the residual 1x1 are bf16 MXU matmuls with f32 accumulation; inference
  BatchNorm is folded to f32 scale/shift.

STATUS — correct but NOT faster than XLA, therefore OPT-IN
(BISCUIT_FUSED_BLOCKS=1; see fused_sepconv.use_fused_blocks). Measured
on v5e at entry0 geometry (150^2, 64->128, B=256, serialized in-jit
chain): fused 21.5 ms vs XLA block 19.4 ms. Three iterations were
profiled (per-tap ref reads 24.0 -> value-slab taps 23.2 -> full value
pipeline 21.5; skip-knob bisection showed compute ~4 ms, the rest VPU
issue + VMEM movement). Root cause: a 3x3 depthwise conv costs 9
FMA-passes/element on the VPU at ~1 vector op/cycle — a floor of ~10 ms
at this geometry that XLA's conv stack also sits on, so eliminating HBM
round trips buys little. The win would need packed-bf16 VPU FMAs or MXU
offload of the taps; tracked as a future lead. The middle-flow kernel
(fused_sepconv.py) wins 1.55x because XLA's middle-flow schedule is much
further from that floor.

Inference-only, like the middle-flow kernel (training keeps XLA convs).
Parity: interpret-mode tests vs the Flax XceptionBlock in
tests/test_fused_block.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38  # -inf stand-in for maxpool padding


def _subsample2(v, axis, offset=0):
    """Elements offset, offset+2, ... along an untiled axis (free reshape
    on the even prefix + tail concat; no strided vector ops)."""

    def slc(arr, a, b):
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(a, b)
        return arr[tuple(idx)]

    if offset:
        v = slc(v, offset, None)
    n = v.shape[axis]
    even_n = (n // 2) * 2
    out = None
    if even_n:
        head = slc(v, 0, even_n)
        new_shape = list(v.shape)
        new_shape[axis] = even_n // 2
        new_shape.insert(axis + 1, 2)
        head = head.reshape(new_shape)
        idx = [slice(None)] * head.ndim
        idx[axis + 1] = 0
        out = head[tuple(idx)]
    if n % 2:
        tail = slc(v, n - 1, n)
        out = tail if out is None else jnp.concatenate([out, tail], axis=axis)
    return out


def _shift_max3(v, axis):
    """max(v[i-1], v[i], v[i+1]) along an untiled axis, NEG-padded."""
    pad_shape = list(v.shape)
    pad_shape[axis] = 1
    pad = jnp.full(pad_shape, _NEG, v.dtype)

    def slc(a, b):
        idx = [slice(None)] * v.ndim
        idx[axis] = slice(a, b)
        return v[tuple(idx)]

    if v.shape[axis] == 1:
        return v
    up = jnp.concatenate([slc(1, None), pad], axis=axis)
    down = jnp.concatenate([pad, slc(0, -1)], axis=axis)
    return jnp.maximum(jnp.maximum(up, v), down)


def _kernel(xu_ref, xm_ref, xd_ref, dw0_ref, pw0_ref, s0_ref, h0_ref,
            dw1_ref, pw1_ref, s1_ref, h1_ref, rw_ref, rs_ref, rh_ref,
            out_ref, *, H, W, NB, Cin, F0, F1, hs, relu_first):
    s = pl.program_id(1)
    L = hs + 6
    n_out = hs // 2
    oh = 1 - (H % 2)
    ow = 1 - (W % 2)
    base = s * hs - 3  # global row of strip-local row 0

    # Assemble the haloed strip and zero out-of-image rows (exact SAME
    # conv padding at the top/bottom borders; also neutralizes the
    # clamped/ragged halo blocks' wrong-row data).
    x = jnp.concatenate([xu_ref[0], xm_ref[0], xd_ref[0]], axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, (L, 1, 1, 1), 0) + base
    in_img = (row >= 0) & (row < H)
    x = jnp.where(in_img, x, jnp.zeros((), x.dtype))

    # The whole sep0 -> sep1 pipeline runs on VALUES (vector registers +
    # compiler-managed spills): materializing intermediates through VMEM
    # scratch buffers made VMEM traffic, not compute, the kernel
    # bottleneck (~20 of 24 ms at entry0 geometry).
    h = jnp.maximum(x, jnp.zeros((), x.dtype)) if relu_first else x
    h = h.astype(jnp.float32)

    def wpad(v):
        zc = jnp.zeros(v.shape[:1] + (1,) + v.shape[2:], v.dtype)
        return jnp.concatenate([zc, v, zc], axis=1)

    def dw_mm(vpad, n_rows, r0, dw_ref, pw_ref, sc_ref, sh_ref, C, F):
        """rows [r0, r0+n_rows) of sepconv+BN over the W-padded value
        vpad (rows are strip-local; vpad row i = strip row i)."""
        acc = jnp.zeros((n_rows, W, NB, C), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = dw_ref[dy * 3 + dx, :]
                acc += (vpad[r0 - 1 + dy:r0 - 1 + dy + n_rows, dx:dx + W]
                        * tap[None, None, None, :])
        flat = acc.reshape(n_rows * W * NB, C).astype(jnp.bfloat16)
        y = jnp.dot(flat, pw_ref[:], preferred_element_type=jnp.float32)
        y = y * sc_ref[0][None, :] + sh_ref[0][None, :]
        return y.reshape(n_rows, W, NB, F)

    # y1 rows needed by the pool: [lo, lo + need); y0 rows [lo-1, lo+need+1).
    need = 2 * n_out + 1
    lo = 2 + oh
    n0 = need + 2
    y0 = dw_mm(wpad(h), n0, lo - 1, dw0_ref, pw0_ref, s0_ref, h0_ref,
               Cin, F0)
    y0 = jnp.maximum(y0, 0.0)
    # Zero out-of-image y0 rows: the next conv must see exact SAME zero
    # padding (BN shift would otherwise leak nonzeros into halo rows).
    g0 = row[lo - 1:lo - 1 + n0]
    y0 = jnp.where((g0 >= 0) & (g0 < H), y0, 0.0)
    y1 = dw_mm(wpad(y0), need, 1, dw1_ref, pw1_ref, s1_ref, h1_ref,
               F0, F1)

    # Maxpool 3x3 stride 2 SAME. TF/Flax SAME padding is asymmetric: the
    # window for output row j is rows [2j-1, 2j+1] when H is odd but
    # [2j, 2j+2] when H is even (same for W). Output row p0+t has its
    # window at strip rows [2+oh+2t, 4+oh+2t]; y1 rows outside the image
    # become -inf.
    slab = y1.astype(jnp.bfloat16)
    srow = row[lo:lo + need]
    slab = jnp.where((srow >= 0) & (srow < H), slab,
                     jnp.full((), _NEG, slab.dtype))
    m3 = jnp.maximum(jnp.maximum(slab[0:need - 2], slab[1:need - 1]),
                     slab[2:need])
    m3 = _shift_max3(m3, axis=1)
    pooled = _subsample2(m3, axis=0)
    pooled = _subsample2(pooled, axis=1, offset=ow)

    # Residual 1x1 stride-2 conv + BN on the raw strip rows (even rows of
    # the mid block; beyond-image rows produce dropped output rows).
    xr = _subsample2(xm_ref[0], axis=0)
    xr = _subsample2(xr, axis=1)
    W2 = pooled.shape[1]
    flat = xr.reshape(n_out * W2 * NB, Cin)
    r = jnp.dot(flat, rw_ref[:], preferred_element_type=jnp.float32)
    r = r * rs_ref[0][None, :] + rh_ref[0][None, :]
    r = r.reshape(n_out, W2, NB, F1)

    out_ref[:] = (pooled.astype(jnp.float32) + r).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("relu_first", "hs", "interpret")
)
def _fused_call(x_gnb, dw0, pw0, s0, h0, dw1, pw1, s1, h1, rw, rs, rh,
                relu_first=True, hs=24, interpret=False):
    G, H, W, nb, Cin = x_gnb.shape
    N = G * nb
    F0 = pw0.shape[1]
    F1 = pw1.shape[1]
    H2, W2 = -(-H // 2), -(-W // 2)
    assert hs % 6 == 0, "strip height must be divisible by 6 (halo blocks)"
    S = -(-H // hs)
    n3 = -(-H // 3)       # 3-row halo block positions along H
    h3 = hs // 3
    kern = functools.partial(
        _kernel, H=H, W=W, NB=nb, Cin=Cin, F0=F0, F1=F1, hs=hs,
        relu_first=relu_first,
    )
    def mid_map(g, s):
        return (g, s, 0, 0, 0)

    def up_map(g, s):
        return (g, jnp.maximum(s * h3 - 1, 0), 0, 0, 0)

    def dn_map(g, s):
        return (g, jnp.minimum(s * h3 + h3, n3 - 1), 0, 0, 0)

    return pl.pallas_call(
        kern,
        grid=(G, S),
        in_specs=[
            pl.BlockSpec((1, 3, W, nb, Cin), up_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hs, W, nb, Cin), mid_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, W, nb, Cin), dn_map,
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(11)],
        out_specs=pl.BlockSpec((hs // 2, W2, nb, F1),
                               lambda g, s: (s, 0, g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H2, W2, N, F1), x_gnb.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * (Cin * 9 + Cin * F0 + F0 * 9 + F0 * F1)
            + 2 * N * H2 * W2 * Cin * F1,
            bytes_accessed=(N * H * W * Cin + N * H2 * W2 * F1) * 2,
            transcendentals=0,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x_gnb, x_gnb, x_gnb, dw0, pw0, s0, h0, dw1, pw1, s1, h1, rw, rs, rh)


def _fold_bn(bn_params, bn_stats, eps=1e-5):
    from .fused_sepconv import fold_bn

    scale, shift = fold_bn(bn_params, bn_stats, eps)
    return scale[None, :], shift[None, :]


def stack_block_weights(block_params, block_stats):
    """XceptionBlock params -> kernel weight tuple (models/xception.py
    naming: sep{0,1}/depthwise|pointwise, bn{0,1}, res_conv, res_bn)."""
    out = []
    for jj in (0, 1):
        k = jnp.asarray(block_params[f"sep{jj}"]["depthwise"]["kernel"])
        out.append(k.reshape(9, -1).astype(jnp.float32))
        p = jnp.asarray(block_params[f"sep{jj}"]["pointwise"]["kernel"])
        out.append(p.reshape(p.shape[-2], p.shape[-1]).astype(jnp.bfloat16))
        out.extend(_fold_bn(block_params[f"bn{jj}"], block_stats[f"bn{jj}"]))
    rw = jnp.asarray(block_params["res_conv"]["kernel"])
    out.append(rw.reshape(rw.shape[-2], rw.shape[-1]).astype(jnp.bfloat16))
    out.extend(_fold_bn(block_params["res_bn"], block_stats["res_bn"]))
    return tuple(out)


# Strip heights per (H, Cin) geometry (divisible by 6; sized to keep bf16
# scratches + f32 chunk values well inside VMEM). Entry geometry follows
# the Keras-exact VALID stem (299 -> 149 -> 147 -> 74 -> 37 -> 19).
_DEFAULT_HS = {
    (147, 64): 24,    # entry0
    (74, 128): 24,    # entry1
    (37, 256): 36,    # entry2 (~single strip)
    (19, 728): 18,    # exit block (single strip)
}


def fused_strided_block(x_nhwc, weights, relu_first: bool = True,
                        hs=None, interpret: bool = False):
    """One Xception strided block on an NHWC activation.

    weights: tuple from stack_block_weights. Returns
    (N, ceil(H/2), ceil(W/2), F1) in x's dtype.
    """
    N, H, W, Cin = x_nhwc.shape
    if hs is None:
        hs = _DEFAULT_HS.get((H, Cin), 18)
    nb = 8
    while N % nb:
        nb //= 2
    # (N/NB, H, W, NB, C): image-group-major so one grid program owns an
    # (NB, C)-tiled strip.
    x = jnp.transpose(
        x_nhwc.reshape(N // nb, nb, H, W, Cin), (0, 2, 3, 1, 4))
    y = _fused_call(x, *weights, relu_first=relu_first, hs=hs,
                    interpret=interpret)
    return jnp.transpose(y, (2, 0, 1, 3))
