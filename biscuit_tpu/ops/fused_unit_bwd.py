"""Fused backward for the sep-conv + train-BatchNorm unit (Pallas, TPU).

Why: the train step spends 96 of its 140 ms (B=128, v5e) in the backward
pass, two-thirds of that in the entry flow (benchmarks/bench_bwd_
breakdown.py). benchmarks/bench_bwd_entry.py shows the sep+BN unit
backward is already at the HBM roofline of the UNFUSED op sequence —
XLA's autodiff chain (dBN, pw dgrad/wgrad, dw dgrad/wgrad, relu mask)
makes ~12 HBM passes over activation-sized tensors. The only way past it
is to stop paying round trips: this module computes the entire unit
backward in one Pallas kernel — read (g_y, p, r, d) once, write da once
(~5 passes), with the pointwise matmuls on the MXU and the depthwise
taps as statically shifted VMEM reads (HWNC layout, like
ops/fused_sepconv.py).

Unit (train mode), mirroring flax exactly (models/xception.py
SeparableConv + nn.BatchNorm; reference: slideflow's Keras
SeparableConv2D+BatchNormalization, /root/reference/biscuit/hp.py:3-24):

    r  = relu(a)                 (skipped when relu_first=False)
    d  = dwconv3x3_SAME(r, Wdw)  bf16
    p  = conv1x1(d, Wpw)         bf16
    pf = f32(p); mu = mean(pf); var = max(0, mean(pf^2) - mu^2)
    y  = bf16((pf - mu) * rsqrt(var+eps) * gamma + beta)

Backward (the classic train-BN + sepconv VJP):

    g   = f32(gy);  xhat = (pf - mu) * inv
    gp  = gamma*inv * (g - mean(g) - xhat * mean(g*xhat))
    gd  = bf16(gp) @ Wpw^T                    [MXU]
    dWpw= d^T @ bf16(gp)                      [MXU, f32 accum]
    gr  = dwconv3x3_SAME(gd, flip(Wdw))       [9 shifted-read FMAs]
    dWdw[u,v,c] = sum_{b,i,j} rpad[b,i+u,j+v,c] * gd[b,i,j,c]
    da  = gr * (r > 0)                        (identity when no relu)
    dgamma = sum(g*xhat); dbeta = sum(g)      [cheap XLA pre-pass]

The per-channel BN sums (mean(g), mean(g*xhat)) must be global over the
batch before any block's elementwise backward, so they run as a separate
fused XLA reduction pass (2 tensor reads); the Pallas kernel then makes
one streaming pass for everything else. Total ~7 passes vs ~12 unfused,
plus the dw taps move from XLA's conv emitter into the same pass.

STATUS — correct but NOT faster than XLA autodiff, therefore OPT-IN
(backend='pallas'/'pallas_strips'; the 'auto' gate PALLAS_BWD_HW is
empty). Measured on v5e (B=128, chained in-jit fwd+bwd, iters=20,
benchmarks/bench_unit_bwd.py), both kernel designs at every trunk
geometry:

    geometry              autodiff   whole-plane     strips
    entry0u0 147^2 64>128   10.29        OOM        21.46 (0.48x)
    entry0u1 147^2 128>128  16.01        OOM        22.85 (0.70x)
    entry1u0 74^2 128>256    4.89    7.43 (0.65x)    8.29 (0.59x)
    entry1u1 74^2 256>256    7.84   13.08 (0.60x)   12.31 (0.64x)
    entry2u0 37^2 256>728    2.67    4.93 (0.62x)    5.10 (0.52x)
    entry2u1 37^2 728>728    7.87   13.04 (0.61x)   12.77 (0.62x)
    middle   19^2 728>728    1.75    3.85 (0.40x)    3.47 (0.51x)
    exitu1   19^2 728>1024   2.09    4.17 (0.49x)    4.21 (0.50x)

Root cause (mirrors the fused_block.py forward record): XLA's autodiff
backward runs AT the unfused-sequence HBM roofline (entry0u1 bwd ~10 ms
~= 12 passes x 708 MB / 819 GB/s — the dBN/relu/elementwise chains fuse
into the conv dgrad/wgrad ops, so the naive pass count is already what
XLA pays), while the fused kernel's theoretical ~5-pass advantage is
consumed by in-kernel VMEM movement: 18 VPU tap passes + W-shift
relayouts (W rides the sublane dim in NHWC, so every +-1 column shift
is a cross-sublane copy) + MXU scratch round trips measure at 2-3x the
kernel's own floor on BOTH designs. Beating XLA here would need the
whole trunk in a W-untiled layout (HWNC end-to-end training), whose
transpose cost exceeds the margin. Training therefore keeps XLA
autodiff (train/fused_train.use_fused_train default-off); the custom
VJP stays as the measured record, the CPU 'reference' backend for the
multichip dryrun, and the seam for any future Mosaic packed-bf16 win.

Numerics vs the flax autodiff path (deliberate, documented deviations —
both strictly MORE precise; parity tests bound them):
  * gd is held in f32 for the depthwise taps (flax round-trips it
    through bf16 between the pw and dw conv VJPs);
  * dWdw/dWpw accumulate in f32 across the batch (flax materializes
    bf16 weight grads, then casts f32).

SURVEY.md §2.3 E4 (training engine); VERDICT r2 weak-2 asked for a
training-side fusion attempt with measured numbers — see
benchmarks/bench_unit_bwd.py for the tuning record.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Forward (identical ops to the flax path, so fwd numerics match exactly)
# ---------------------------------------------------------------------------

def _dw_conv(x, wdw):
    """Depthwise 3x3 SAME, bf16 (wdw: (3, 3, 1, C) f32, cast like flax)."""
    return jax.lax.conv_general_dilated(
        x, wdw.astype(x.dtype), (1, 1), "SAME",
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _pw_conv(x, wpw):
    return jax.lax.conv_general_dilated(
        x, wpw.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def unit_fwd(a, wdw, wpw, gamma, beta, eps, relu_first):
    """Forward of the unit; returns (y, mean, var, residuals)."""
    r = jax.nn.relu(a) if relu_first else a
    d = _dw_conv(r, wdw)
    p = _pw_conv(d, wpw)
    pf = p.astype(jnp.float32)
    mu = jnp.mean(pf, axis=(0, 1, 2))
    mu2 = jnp.mean(jnp.square(pf), axis=(0, 1, 2))
    var = jnp.maximum(0.0, mu2 - jnp.square(mu))
    inv = jax.lax.rsqrt(var + eps)
    gamma = jnp.asarray(gamma, jnp.float32)
    beta = jnp.asarray(beta, jnp.float32)
    y = ((pf - mu) * (inv * gamma) + beta).astype(a.dtype)
    return y, mu, var, (r, d, p)


# ---------------------------------------------------------------------------
# Reference backward (XLA composition of the same math as the kernel)
# ---------------------------------------------------------------------------

def unit_bwd_reference(gy, r, d, p, wdw, wpw, gamma, mu, var, eps,
                       relu_first):
    """Manual VJP as plain XLA ops — the kernel's parity oracle and the
    CPU fallback. Returns (da, dwdw, dwpw, dgamma, dbeta)."""
    H = r.shape[1]
    inv = jax.lax.rsqrt(var + eps)
    g = gy.astype(jnp.float32)
    pf = p.astype(jnp.float32)
    xhat = (pf - mu) * inv
    m = g.shape[0] * g.shape[1] * g.shape[2]
    sum_g = jnp.sum(g, axis=(0, 1, 2))
    sum_gx = jnp.sum(g * xhat, axis=(0, 1, 2))
    gamma = jnp.asarray(gamma, jnp.float32)
    gp = (gamma * inv) * (g - sum_g / m - xhat * (sum_gx / m))
    cdt = gy.dtype  # compute dtype (bf16 on the real path)
    gpb = gp.astype(cdt)
    # pw dgrad: (..., Co) @ (Co, Ci)
    wpw2 = wpw.astype(cdt)[0, 0]  # (Ci, Co)
    gd = jax.lax.dot_general(
        gpb.reshape(-1, gpb.shape[-1]), wpw2.T,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(r.shape[:-1]
                                                    + (r.shape[-1],))
    dwpw = jax.lax.dot_general(
        d.astype(cdt).reshape(-1, d.shape[-1]),
        gpb.reshape(-1, gpb.shape[-1]),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[None, None]  # (1,1,Ci,Co)
    # dw dgrad: SAME conv of gd with flipped taps (per channel).
    gdpad = jnp.pad(gd, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = wdw.astype(jnp.float32).reshape(9, -1)
    gr = jnp.zeros_like(gd)
    for u in range(3):
        for v in range(3):
            w_uv = taps[(2 - u) * 3 + (2 - v)]
            gr = gr + gdpad[:, u:u + H, v:v + gd.shape[2], :] * w_uv
    # dw wgrad: correlate padded r with gd.
    rpad = jnp.pad(r.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    dwdw = []
    for u in range(3):
        for v in range(3):
            dwdw.append(jnp.sum(
                rpad[:, u:u + H, v:v + gd.shape[2], :] * gd,
                axis=(0, 1, 2)))
    dwdw = jnp.stack(dwdw).reshape(3, 3, 1, -1)
    da = (gr * (r > 0) if relu_first else gr).astype(gy.dtype)
    return da, dwdw, dwpw, sum_gx, sum_g


# ---------------------------------------------------------------------------
# Pallas kernel: one streaming pass for everything after the BN sums
# ---------------------------------------------------------------------------

def _unit_bwd_kernel(gy_ref, p_ref, r_ref, d_ref, wflip_ref, wpwt_ref,
                     vec_ref, ga_ref, dwdw_ref, dwpw_ref,
                     gdpad_ref, rpad_ref, gp_scr, d_scr,
                     *, H, W, NB, CI, CO, relu_first):
    # NHWC blocks: (NB, H, W, C) with (W, C) on (sublane, lane) — batch
    # rides an untiled leading dim, so any NB divides into VMEM (the HWNC
    # layout of the fwd kernel needs 8 images per block, which overflows
    # VMEM at the 147x147 entry geometry). Cost: the W-shifted tap reads
    # are unaligned sublane slices (Mosaic relayout) — measured in
    # benchmarks/bench_unit_bwd.py.
    # vec_ref: (5, CO) f32 rows = [A=gamma*inv, B=A*mean(g), C=A*mean(g*xh),
    #                              inv, mu*inv]
    i = pl.program_id(0)
    WP = gp_scr.shape[2]

    @pl.when(i == 0)
    def _init():
        dwdw_ref[:] = jnp.zeros_like(dwdw_ref)
        dwpw_ref[:] = jnp.zeros_like(dwpw_ref)
        # Zero the W-pad columns once; later steps only write [:W].
        gp_scr[:] = jnp.zeros(gp_scr.shape, gp_scr.dtype)
        d_scr[:] = jnp.zeros(d_scr.shape, d_scr.dtype)

    g = gy_ref[:].astype(jnp.float32)
    pf = p_ref[:].astype(jnp.float32)
    vec = vec_ref[:]
    xh = pf * vec[3][None, None, None, :] - vec[4][None, None, None, :]
    gp = (g * vec[0][None, None, None, :] - vec[1][None, None, None, :]
          - xh * vec[2][None, None, None, :])
    gpb = gp.astype(jnp.bfloat16)
    # MXU matmuls (pw dgrad + wgrad): Mosaic only contracts single dims
    # and can only collapse (NB, H, WP) when the sublane dim WP is a tile
    # multiple, so both run through zero-padded scratches (pad columns
    # stay zero after the i==0 init; their dgrad rows are sliced off and
    # they contribute exact zeros to the wgrad).
    gp_scr[:, :, :W, :] = gpb
    d_scr[:, :, :W, :] = d_ref[:]
    gp_flat = gp_scr[:].reshape(NB * H * WP, CO)
    gd = jax.lax.dot_general(
        gp_flat, wpwt_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(NB, H, WP, CI)[:, :, :W, :]
    dwpw_ref[:] += jax.lax.dot_general(
        d_scr[:].reshape(NB * H * WP, CI),
        gp_flat,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    gdpad_ref[:] = jnp.zeros(gdpad_ref.shape, jnp.float32)
    gdpad_ref[:, 1:H + 1, 1:W + 1, :] = gd
    rpad_ref[:] = jnp.zeros(rpad_ref.shape, jnp.float32)
    r = r_ref[:].astype(jnp.float32)
    rpad_ref[:, 1:H + 1, 1:W + 1, :] = r

    # dw dgrad: 9 shifted-read FMAs with flipped taps.
    gr = jnp.zeros((NB, H, W, CI), jnp.float32)
    for u in range(3):
        for v in range(3):
            tap = wflip_ref[u * 3 + v, :]
            gr += (gdpad_ref[:, u:u + H, v:v + W, :]
                   * tap[None, None, None, :])
    # dw wgrad: shifted-read multiply + full reduce per tap.
    for u in range(3):
        for v in range(3):
            dwdw_ref[u * 3 + v, :] += jnp.sum(
                rpad_ref[:, u:u + H, v:v + W, :] * gd, axis=(0, 1, 2))

    if relu_first:
        gr = jnp.where(r > 0, gr, 0.0)
    ga_ref[:] = gr.astype(ga_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "relu_first",
                                             "interpret"))
def unit_bwd_pallas(gy, r, d, p, wdw, wpw, gamma, mu, var, eps,
                    relu_first, interpret=False):
    """Fused unit backward. NHWC in/out; HWNC inside (transposes left to
    XLA). Returns (da, dwdw, dwpw, dgamma, dbeta) with dwdw (3,3,1,CI)
    f32 and dwpw (1,1,CI,CO) f32."""
    N, H, W, CI = r.shape
    CO = gy.shape[-1]
    inv = jax.lax.rsqrt(var + eps)
    g32 = gy.astype(jnp.float32)
    pf = p.astype(jnp.float32)
    # BN sums pre-pass (one fused XLA reduction over gy, p).
    sum_g = jnp.sum(g32, axis=(0, 1, 2))
    sum_gp = jnp.sum(g32 * pf, axis=(0, 1, 2))
    m = N * H * W
    sum_gx = (sum_gp - mu * sum_g) * inv
    gamma32 = jnp.asarray(gamma, jnp.float32)
    A = gamma32 * inv
    vec = jnp.stack([A, A * (sum_g / m), A * (sum_gx / m), inv, mu * inv])

    taps = wdw.astype(jnp.float32).reshape(9, CI)
    wflip = taps[::-1]  # (u,v) -> (2-u, 2-v) is a full reverse in tap order
    wpwt = wpw.astype(jnp.bfloat16)[0, 0].T  # (CO, CI)

    # W padded to the bf16 sublane tile (16): Mosaic can only collapse
    # (nb, H, WP, C) -> (nb*H*WP, C) for the MXU when the sublane dim is
    # a tile multiple (probed on-chip; unpadded W is rejected).
    WP = -(-W // 16) * 16
    nb = 1
    # Largest nb that divides N and keeps VMEM under budget (operand
    # blocks are double-buffered by the pipeline; scratches are not).
    per_img = (2 * H * W * (3 * CI + 2 * CO) * 2      # bf16 operands + out
               + (H + 2) * (W + 2) * 2 * CI * 4      # f32 pad scratches
               + H * WP * (CI + CO) * 2)             # bf16 MXU scratches
    budget = 100 * 1024 * 1024 - (CI * CO * 6 + 14 * CI * 4 + 5 * CO * 4)
    for cand in (8, 4, 2, 1):
        if N % cand == 0 and cand * per_img < budget:
            nb = cand
            break
    const = lambda i: (0, 0)  # noqa: E731

    kern = functools.partial(_unit_bwd_kernel, H=H, W=W, NB=nb, CI=CI,
                             CO=CO, relu_first=relu_first)
    da, dwdw, dwpw = pl.pallas_call(
        kern,
        grid=(N // nb,),
        in_specs=[
            pl.BlockSpec((nb, H, W, CO), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, H, W, CO), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, H, W, CI), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, H, W, CI), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, CI), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((CO, CI), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((5, CO), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb, H, W, CI), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, CI), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((CI, CO), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, W, CI), gy.dtype),
            jax.ShapeDtypeStruct((9, CI), jnp.float32),
            jax.ShapeDtypeStruct((CI, CO), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb, H + 2, W + 2, CI), jnp.float32),
            pltpu.VMEM((nb, H + 2, W + 2, CI), jnp.float32),
            pltpu.VMEM((nb, H, WP, CO), jnp.bfloat16),
            pltpu.VMEM((nb, H, WP, CI), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * (2 * CI * CO + 18 * CI + 6 * CO),
            bytes_accessed=N * H * W * (2 * CO + 3 * CI) * 2,
            transcendentals=0,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(gy, p, r, d, wflip, wpwt, vec)

    return (da, dwdw.reshape(3, 3, 1, CI), dwpw[None, None],
            sum_gx, sum_g)


# ---------------------------------------------------------------------------
# H-strip kernel: same math, strip grid + 3-row halo blocks (fused_block.py
# recipe) so the 147x147 entry geometries fit VMEM. Values-only inside the
# strip (no pad scratches): W-shifted tap reads become two concat-shifted
# copies of gd / r instead of 18 unaligned pad-buffer slices.
# ---------------------------------------------------------------------------

def _shift_w(v, direction):
    """Zero-padded W shift of (nb, L, W, C): direction=+1 -> out[j]=v[j-1]."""
    zc = jnp.zeros(v.shape[:2] + (1,) + v.shape[3:], v.dtype)
    if direction > 0:
        return jnp.concatenate([zc, v[:, :, :-1, :]], axis=2)
    return jnp.concatenate([v[:, :, 1:, :], zc], axis=2)


def _unit_bwd_strip_kernel(
        gy_up, gy_mid, gy_dn, p_up, p_mid, p_dn, r_up, r_mid, r_dn, d_mid,
        wflip_ref, wpwt_ref, vec_ref, ga_ref, dwdw_ref, dwpw_ref,
        gp_scr, d_scr, *, H, W, NB, CI, CO, hs, relu_first):
    g_id = pl.program_id(0)
    s = pl.program_id(1)
    WP = gp_scr.shape[2]
    base = s * hs - 3  # global row of strip-local row 0

    @pl.when((g_id == 0) & (s == 0))
    def _init():
        dwdw_ref[:] = jnp.zeros_like(dwdw_ref)
        dwpw_ref[:] = jnp.zeros_like(dwpw_ref)
        gp_scr[:] = jnp.zeros(gp_scr.shape, gp_scr.dtype)
        d_scr[:] = jnp.zeros(d_scr.shape, d_scr.dtype)

    # Haloed strip (L = hs + 6 local rows); out-of-image rows zeroed (also
    # neutralizes clamped edge halo blocks' wrong-row data). Only local
    # rows [2, hs+4) matter downstream, so assemble just those (hs+2 rows:
    # 1 halo row each side of the strip).
    def slab(up, mid, dn):
        x = jnp.concatenate([up[:], mid[:], dn[:]], axis=1)[:, 2:hs + 4]
        row = jax.lax.broadcasted_iota(jnp.int32, (1, hs + 2, 1, 1), 1) + (
            base + 2)
        return jnp.where((row >= 0) & (row < H), x, jnp.zeros((), x.dtype))

    g = slab(gy_up, gy_mid, gy_dn).astype(jnp.float32)
    pf = slab(p_up, p_mid, p_dn).astype(jnp.float32)
    rs = slab(r_up, r_mid, r_dn).astype(jnp.float32)
    vec = vec_ref[:]
    xh = pf * vec[3][None, None, None, :] - vec[4][None, None, None, :]
    gp = (g * vec[0][None, None, None, :] - vec[1][None, None, None, :]
          - xh * vec[2][None, None, None, :])
    # Out-of-image rows: g=0 but the BN backward's -B - xh*C terms are
    # nonzero there; the slab mask zeroed pf so xh = -mu*inv exactly, and
    # gp must be re-zeroed so halo gd rows contribute nothing.
    row = jax.lax.broadcasted_iota(jnp.int32, (1, hs + 2, 1, 1), 1) + (
        base + 2)
    in_img = (row >= 0) & (row < H)
    gp = jnp.where(in_img, gp, 0.0)
    gpb = gp.astype(jnp.bfloat16)

    # MXU matmuls through W-padded scratches (Mosaic collapses (NB, rows,
    # WP) only when the sublane dim is a tile multiple).
    gp_scr[:, :, :W, :] = gpb
    # Mask the ragged last strip's out-of-image d rows: OOB block reads
    # are undefined (NaN in interpret mode) and 0 * NaN = NaN in dwpw.
    row_mid = jax.lax.broadcasted_iota(jnp.int32, (1, hs, 1, 1), 1) + (
        base + 3)
    d_scr[:, :, :W, :] = jnp.where(row_mid < H, d_mid[:],
                                   jnp.zeros((), d_mid.dtype))
    gp_flat = gp_scr[:].reshape(NB * (hs + 2) * WP, CO)
    gd = jax.lax.dot_general(
        gp_flat, wpwt_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(NB, hs + 2, WP, CI)[:, :, :W, :]
    dwpw_ref[:] += jax.lax.dot_general(
        d_scr[:].reshape(NB * hs * WP, CI),
        gp_scr[:, 1:hs + 1].reshape(NB * hs * WP, CO),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # Two W-shifted copies serve both the dgrad (9 taps) and wgrad (9
    # sums): 2 relayouts total instead of 18 unaligned pad-buffer reads.
    gd_r = _shift_w(gd, +1)   # gd_r[j] = gd[j-1]
    gd_l = _shift_w(gd, -1)   # gd_l[j] = gd[j+1]
    shifts = (gd_r, gd, gd_l)

    wf = wflip_ref[:]
    gr = jnp.zeros((NB, hs, W, CI), jnp.float32)
    for u in range(3):
        for v in range(3):
            tap = wf[u * 3 + v, :]
            gr += shifts[v][:, u:u + hs] * tap[None, None, None, :]

    # dwdw[u,v] = sum_{strip i, j} r[i+u-1, j+v-1] * gd[i, j]: free row
    # slices of the haloed r against the strip's gd rows (gd value rows
    # 1..hs+1), W offsets via the same two shifted copies.
    gd_mid = gd[:, 1:hs + 1]
    rs_r = _shift_w(rs, +1)
    rs_l = _shift_w(rs, -1)
    # r[j+v-1] as a function of j: v=0 -> r[j-1] = shift-right copy.
    r_shifts = (rs_r, rs, rs_l)
    for u in range(3):
        for v in range(3):
            dwdw_ref[u * 3 + v, :] += jnp.sum(
                r_shifts[v][:, u:u + hs] * gd_mid, axis=(0, 1, 2))

    rmid = rs[:, 1:hs + 1]
    if relu_first:
        gr = jnp.where(rmid > 0, gr, 0.0)
    ga_ref[:] = gr.astype(ga_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "relu_first", "hs",
                                             "interpret"))
def unit_bwd_pallas_strips(gy, r, d, p, wdw, wpw, gamma, mu, var, eps,
                           relu_first, hs=24, interpret=False):
    """Strip-grid fused unit backward: NHWC in/out, grid (N/nb, S) with
    3-row halo blocks. Covers the large entry geometries the whole-plane
    kernel cannot fit in VMEM. Returns (da, dwdw, dwpw, dgamma, dbeta)."""
    N, H, W, CI = r.shape
    CO = gy.shape[-1]
    if H < 3 or hs % 3:
        raise ValueError("strip kernel needs H >= 3 and hs % 3 == 0")
    hs = min(hs, -(-H // 3) * 3)
    inv = jax.lax.rsqrt(var + eps)
    g32 = gy.astype(jnp.float32)
    pf = p.astype(jnp.float32)
    sum_g = jnp.sum(g32, axis=(0, 1, 2))
    sum_gp = jnp.sum(g32 * pf, axis=(0, 1, 2))
    m = N * H * W
    sum_gx = (sum_gp - mu * sum_g) * inv
    gamma32 = jnp.asarray(gamma, jnp.float32)
    A = gamma32 * inv
    vec = jnp.stack([A, A * (sum_g / m), A * (sum_gx / m), inv, mu * inv])

    taps = wdw.astype(jnp.float32).reshape(9, CI)
    wflip = taps[::-1]
    wpwt = wpw.astype(jnp.bfloat16)[0, 0].T  # (CO, CI)

    WP = -(-W // 16) * 16
    S = -(-H // hs)
    h3 = hs // 3
    n3 = -(-H // 3)
    # VMEM per image-row-strip (bf16 operand blocks double-buffered by the
    # pipeline + f32 value slabs); pick the largest nb that divides N.
    per_img = (2 * (hs + 6) * W * (2 * CO + 2 * CI) * 2   # operands + da
               + (hs + 2) * WP * (CO + CI) * 2            # MXU scratches
               + (hs + 2) * W * (2 * CO + 6 * CI) * 4)    # f32 value slabs
    budget = 96 * 1024 * 1024
    nb = 1
    for cand in (8, 4, 2, 1):
        if N % cand == 0 and cand * per_img < budget:
            nb = cand
            break

    def mid(gi, si):
        return (gi, si, 0, 0)

    def up(gi, si):
        return (gi, jnp.maximum(si * h3 - 1, 0), 0, 0)

    def dn(gi, si):
        return (gi, jnp.minimum(si * h3 + h3, n3 - 1), 0, 0)

    def specs(C):
        return [
            pl.BlockSpec((nb, 3, W, C), up, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, hs, W, C), mid, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 3, W, C), dn, memory_space=pltpu.VMEM),
        ]

    const = lambda gi, si: (0, 0)  # noqa: E731
    kern = functools.partial(_unit_bwd_strip_kernel, H=H, W=W, NB=nb,
                             CI=CI, CO=CO, hs=hs, relu_first=relu_first)
    da, dwdw, dwpw = pl.pallas_call(
        kern,
        grid=(N // nb, S),
        in_specs=(specs(CO) + specs(CO) + specs(CI)
                  + [pl.BlockSpec((nb, hs, W, CI), mid,
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((9, CI), const, memory_space=pltpu.VMEM),
                     pl.BlockSpec((CO, CI), const, memory_space=pltpu.VMEM),
                     pl.BlockSpec((5, CO), const,
                                  memory_space=pltpu.VMEM)]),
        out_specs=[
            pl.BlockSpec((nb, hs, W, CI), mid, memory_space=pltpu.VMEM),
            pl.BlockSpec((9, CI), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((CI, CO), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, W, CI), gy.dtype),
            jax.ShapeDtypeStruct((9, CI), jnp.float32),
            jax.ShapeDtypeStruct((CI, CO), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb, hs + 2, WP, CO), jnp.bfloat16),
            pltpu.VMEM((nb, hs, WP, CI), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * (2 * CI * CO + 18 * CI + 6 * CO),
            bytes_accessed=N * H * W * (2 * CO + 3 * CI) * 2,
            transcendentals=0,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(gy, gy, gy, p, p, p, r, r, r, d, wflip, wpwt, vec)

    return (da, dwdw.reshape(3, 3, 1, CI), dwpw[None, None],
            sum_gx, sum_g)


# ---------------------------------------------------------------------------
# custom_vjp wrapper: the integration seam for the fused train path
# ---------------------------------------------------------------------------

# Spatial sizes where the Pallas kernel is compile-proven AND measured
# faster than the XLA composition on a real chip (benchmarks/
# bench_unit_bwd.py; record below). Larger planes (74, 147) currently
# OOM the Mosaic compiler: the whole H x W plane sits in one block and
# the unaligned W-shifted tap reads unroll into huge vector programs.
# An H-strip redesign (fused_block.py's halo recipe) would lift this.
PALLAS_BWD_HW: frozenset = frozenset()


def _bwd_fn(backend: str, hw: int):
    if backend == "pallas":
        return unit_bwd_pallas
    if backend == "pallas_strips":
        return unit_bwd_pallas_strips
    if backend == "reference":
        return unit_bwd_reference
    if jax.devices()[0].platform == "tpu" and hw in PALLAS_BWD_HW:
        return unit_bwd_pallas_strips
    return unit_bwd_reference


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def sep_bn_unit(a, wdw, wpw, gamma, beta, eps, relu_first, backend):
    """relu? -> depthwise 3x3 -> pointwise 1x1 -> train-BatchNorm, with a
    fused backward. Returns (y, batch_mean, batch_var); the mean/var
    outputs feed the running-stats update and are NOT differentiated
    (their cotangents are ignored — they are zero in the training loss
    path, which touches them only through stop-gradient stats updates).

    ``backend``: 'pallas' | 'reference' | 'auto' (pallas on TPU).
    """
    y, mu, var, _ = unit_fwd(a, wdw, wpw, gamma, beta, eps, relu_first)
    return y, mu, var


def _sep_bn_unit_fwd(a, wdw, wpw, gamma, beta, eps, relu_first, backend):
    y, mu, var, (r, d, p) = unit_fwd(a, wdw, wpw, gamma, beta, eps,
                                     relu_first)
    return (y, mu, var), (r, d, p, wdw, wpw, gamma, mu, var)


def _sep_bn_unit_bwd(eps, relu_first, backend, res, cots):
    gy, _gmu, _gvar = cots  # mean/var cotangents ignored (see docstring)
    r, d, p, wdw, wpw, gamma, mu, var = res
    fn = _bwd_fn(backend, r.shape[1])
    da, dwdw, dwpw, dgamma, dbeta = fn(gy, r, d, p, wdw, wpw, gamma, mu,
                                       var, eps, relu_first)
    return (da, dwdw.astype(wdw.dtype), dwpw.astype(wpw.dtype),
            dgamma.astype(gamma.dtype), dbeta.astype(gamma.dtype))


sep_bn_unit.defvjp(_sep_bn_unit_fwd, _sep_bn_unit_bwd)
