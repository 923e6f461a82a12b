"""Probe: does int8 (s8 x s8 -> s32) run ~2x bf16 on the v5e MXU, at the
geometries this model actually has?

Motivation: the trunk inference budget at B=1024 splits ~147 ms depthwise
(VPU-issue floor, closed — ops/fused_sepconv.py tuning record) + ~98 ms
everything else, which is dominated by MXU ops (pointwise convs, stem,
residual 1x1s, exit sepconv pointwise, head). v5e peak is 197 bf16 TFLOP/s
vs 394 int8 TOP/s, so a w8a8 quantized inference path could halve the MXU
share *if* XLA actually emits native int8 MXU convolutions rather than
upcasting. This probe measures that, per geometry, before any quantization
machinery is built.

Methodology (CLAUDE.md / memory: same-args-repeated timing lies over the
tunnel): each measurement is ONE jit program containing a lax.fori_loop
chain with a data dependence between iterations (a cheap scalar hash of the
output perturbs the next input), so per-call dispatch overhead is paid once
and the device cannot cache-skip iterations. bf16 and int8 variants use the
identical harness, including the int8 path's requantize step (the cost a
real quantized forward would pay between layers).

Run (one geometry per process — remote compiles are minutes and a hung
compile should kill only one measurement):
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_int8_probe.py [geom_idx]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from biscuit_tpu.ops.threshold_device import _enable_persistent_compile_cache

_enable_persistent_compile_cache()

ITERS = 20
B = 256

# (name, H, W, Cin, Cout, kernel, stride) — the model's MXU-heavy convs.
GEOMS = [
    ("middle_pw 19x19 728->728", 19, 19, 728, 728, 1, 1),
    ("exit_pw   10x10 1536->2048", 10, 10, 1536, 2048, 1, 1),
    ("entry_pw  75x75 128->128", 75, 75, 128, 128, 1, 1),
    ("stem conv2 147x147 32->64 k3", 147, 147, 32, 64, 3, 1),
    ("big dot 8192^3 (peak probe)", 0, 0, 8192, 8192, 0, 1),
    # Composite (idx 5/6): the real mixed pattern a quantized entry flow
    # would run — bf16 depthwise (VPU, dtype-independent) feeding a
    # pointwise that is either bf16 (status quo) or int8 with the
    # quantize/requantize converts a w8a8 layer pays. Measures whether
    # int8's halved HBM bytes + doubled MXU beat the convert overhead at
    # the HBM-heaviest geometries.
    ("entry0 sep 147x147 64->128 MIXED", 147, 147, 64, 128, -1, 1),
    ("entry1 sep 74x74 128->256 MIXED", 74, 74, 128, 256, -1, 1),
]


def _chain_mixed(x, wd, wp, *, int8_pw, iters):
    """dw3x3(bf16) -> [quant -> int8 pw -> dequant | bf16 pw] chain.

    x is bf16 NHWC; wd is (3,3,C,1)-style depthwise bf16; wp is the
    pointwise kernel in int8 or bf16. Output feeds the next iteration
    (channel-sliced/tiled back to Cin) so iterations are data-dependent.
    """
    cin = x.shape[-1]

    def body(i, carry):
        x, bump = carry
        h = jax.lax.conv_general_dilated(
            x, wd, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=cin,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        if int8_pw:
            q = jnp.clip(jnp.round(h.astype(jnp.float32) * 16.0),
                         -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                q, wp, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            yf = y.astype(jnp.float32) * (1.0 / 16.0)
        else:
            yf = jax.lax.conv_general_dilated(
                h, wp, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
        bump = bump + jnp.sum(yf[0, 0, 0, :3])
        nxt = (yf[:, :, :, :cin] * 0.01 + bump * 1e-12).astype(jnp.bfloat16)
        return nxt, bump

    x, bump = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
    return bump


def measure_mixed(name, H, W, cin, cout):
    rng = np.random.default_rng(0)
    b = 256  # entry activations are huge; keep two live buffers in HBM
    x = jnp.asarray(rng.standard_normal((b, H, W, cin)) * 0.1, jnp.bfloat16)
    wd = jnp.asarray(rng.standard_normal((3, 3, 1, cin)) * 0.2, jnp.bfloat16)
    # dw kernel layout for feature_group_count=cin: (3,3,1,cin) HWIO.
    rows = []
    for int8_pw, label in ((False, "bf16"), (True, "int8")):
        wp = (jnp.asarray(rng.integers(-3, 3, (1, 1, cin, cout)), jnp.int8)
              if int8_pw else
              jnp.asarray(rng.standard_normal((1, 1, cin, cout)) * 0.05,
                          jnp.bfloat16))
        fn = jax.jit(functools.partial(_chain_mixed, int8_pw=int8_pw,
                                       iters=ITERS))
        r = fn(x, wd, wp)
        r.block_until_ready()
        t0 = time.perf_counter()
        r = fn(x, wd, wp)
        r.block_until_ready()
        dt = time.perf_counter() - t0
        per_op_ms = dt / ITERS * 1e3
        rows.append((label, per_op_ms))
        print(f"  {name:34s} {label}: {per_op_ms:8.3f} ms/iter", flush=True)
    print(f"  {name:34s} int8-pw speedup: {rows[0][1] / rows[1][1]:.2f}x",
          flush=True)


def _chain_conv(x, w, scale, *, k, dtype, iters):
    """fori chain of conv -> (requant back to input dtype) with a data dep."""

    def body(i, carry):
        x, bump = carry
        if dtype == jnp.int8:
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            yf = y.astype(jnp.float32) * scale
        else:
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            yf = y
        # Data dependence: fold a scalar of y into the next input.
        bump = bump + jnp.sum(yf[0, 0, 0, :3])
        if dtype == jnp.int8:
            # Requantize (what a real quantized layer pays): clip+round.
            nxt = jnp.clip(
                yf * (1.0 / scale) * 0.001 + bump * 1e-12, -127, 127
            ).astype(jnp.int8)
            nxt = nxt[:, :, :, : x.shape[-1]] if yf.shape[-1] >= x.shape[-1] \
                else jnp.tile(nxt, (1, 1, 1, x.shape[-1] // yf.shape[-1]))
        else:
            nxt = (yf * 0.001 + bump * 1e-12).astype(x.dtype)
            nxt = nxt[:, :, :, : x.shape[-1]] if yf.shape[-1] >= x.shape[-1] \
                else jnp.tile(nxt, (1, 1, 1, x.shape[-1] // yf.shape[-1]))
        return nxt, bump

    (x, bump) = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
    return bump


def _chain_dot(x, w, *, dtype, iters):
    def body(i, carry):
        x, bump = carry
        if dtype == jnp.int8:
            y = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            yf = y.astype(jnp.float32)
            bump = bump + yf[0, 0]
            nxt = jnp.clip(yf * 1e-6 + bump * 1e-12, -127, 127).astype(jnp.int8)
        else:
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            bump = bump + y[0, 0]
            nxt = (y * 1e-6 + bump * 1e-12).astype(x.dtype)
        return nxt, bump

    x, bump = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
    return bump


def measure(name, H, W, cin, cout, k, stride):
    rng = np.random.default_rng(0)
    rows = []
    for dtype, label in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
        if k == 0:  # dot probe
            x = jnp.asarray(
                rng.integers(-3, 3, (cin, cin)), dtype
            ) if dtype == jnp.int8 else jnp.asarray(
                rng.standard_normal((cin, cin)) * 0.1, dtype)
            w = jnp.asarray(rng.integers(-3, 3, (cin, cout)), dtype) \
                if dtype == jnp.int8 else jnp.asarray(
                    rng.standard_normal((cin, cout)) * 0.1, dtype)
            fn = jax.jit(functools.partial(_chain_dot, dtype=dtype,
                                           iters=ITERS))
            args = (x, w)
            flops = 2.0 * cin * cin * cout * ITERS
        else:
            x = jnp.asarray(rng.integers(-3, 3, (B, H, W, cin)), dtype) \
                if dtype == jnp.int8 else jnp.asarray(
                    rng.standard_normal((B, H, W, cin)) * 0.1, dtype)
            w = jnp.asarray(rng.integers(-3, 3, (k, k, cin, cout)), dtype) \
                if dtype == jnp.int8 else jnp.asarray(
                    rng.standard_normal((k, k, cin, cout)) * 0.05, dtype)
            scale = jnp.float32(0.01)
            fn = jax.jit(functools.partial(_chain_conv, k=k, dtype=dtype,
                                           iters=ITERS))
            args = (x, w, scale)
            flops = 2.0 * B * H * W * cin * cout * k * k * ITERS
        r = fn(*args)
        r.block_until_ready()  # compile + warm
        t0 = time.perf_counter()
        r = fn(*args)
        r.block_until_ready()
        dt = time.perf_counter() - t0
        per_op_ms = dt / ITERS * 1e3
        tflops = flops / dt / 1e12
        rows.append((label, per_op_ms, tflops))
        print(f"  {name:34s} {label}: {per_op_ms:8.3f} ms/op  "
              f"{tflops:7.1f} T{'OP' if label == 'int8' else 'FLOP'}/s",
              flush=True)
    speedup = rows[0][1] / rows[1][1]
    print(f"  {name:34s} int8 speedup: {speedup:.2f}x", flush=True)


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    def run_one(g):
        if g[5] == -1:
            measure_mixed(g[0], g[1], g[2], g[3], g[4])
        else:
            measure(*g)

    if len(sys.argv) > 1:
        run_one(GEOMS[int(sys.argv[1])])
        return
    for g in GEOMS:
        run_one(g)


if __name__ == "__main__":
    main()
