"""Entry-flow backward attribution at composition level (bwd lever).

bench_bwd_breakdown.py: entry-flow backward owns 63.5 ms of the 96 ms
train-step backward. bench_bwd_ops.py's per-op numbers were noise-limited
(iters=4, ~1-2 ms tunnel jitter); this bench uses iters=20 and measures
the *composed* pieces of the entry flow as the model actually runs them:

  - each full XceptionBlock (sep units + BN + maxpool + strided 1x1
    residual) at its real geometry, fwd vs fwd+bwd;
  - maxpool 3x3 s2 SAME alone (SelectAndScatter backward is the classic
    TPU slowpath suspect);
  - strided 1x1 residual conv alone (dgrad needs input dilation);
  - sep+BN unit alone (depthwise + pointwise + train-BN).

Chained in-jit timing with data dependence (CLAUDE.md: independent
dispatches lie through the tunnel). Numbers recorded in the docstring
once measured.

Measured (v5e, B=128, r3, iters=20):
    block entry0 147x147x64->128 s2   fwd  7.34  f+b 39.26  bwd 31.92 (4.3x)
    block entry1  74x74x128->256 s2   fwd  3.66  f+b 19.26  bwd 15.60 (4.3x)
    block entry2  37x37x256->728 s2   fwd  3.57  f+b 14.61  bwd 11.04 (3.1x)
    pool 147x147x128 3x3s2            fwd  3.85  f+b  8.39  bwd  4.54 (1.2x)
    pool  74x74x256  3x3s2            fwd  1.80  f+b  3.96  bwd  2.16 (1.2x)
    res  147x147x64->128 1x1s2        fwd  1.35  f+b  1.69  bwd  0.34 (0.3x)
    unit 147x147x64->128  sep+bn      fwd  3.98  f+b 10.24  bwd  6.26 (1.6x)
    unit 147x147x128->128 sep+bn      fwd  6.06  f+b 17.79  bwd 11.73 (1.9x)
    unit  74x74x128->256  sep+bn      fwd  1.95  f+b  5.58  bwd  3.63 (2.3x)

Conclusions:
* The three entry blocks own 58.6 ms of the 63.5 ms entry backward;
  entry0 alone owns 31.9.
* The sep+BN unit backward is ~HBM-roofline FOR THE UNFUSED OP SEQUENCE:
  the 128->128@147 unit's backward chain (dBN, pw dgrad/wgrad, dw
  dgrad/wgrad, relu mask) makes ~12 HBM passes over 708 MB tensors
  ~= 10 ms at 819 GB/s — close to the 11.7 measured. Beating it needs a
  fused Pallas VJP (read g/h_relu/h_dw once, write dx once ~= 4 passes),
  whose own floor is the VPU dw issue rate (~18 taps/elem ~= 5.3 ms).
* SelectAndScatter (pool bwd) is NOT the villain (1.2x its fwd) — but
  the pool FORWARD is 3.6x off roofline (3.85 vs ~1.1 ms), and pools sit
  in both the train step and the B=1024 inference entry flow. See
  bench_pool_variants.py for the formulation shootout.

Run: python benchmarks/bench_bwd_entry.py [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    import jax
    import jax.numpy as jnp

    from biscuit_tpu.models.xception import XceptionBlock

    print(f"device={jax.devices()[0].device_kind} batch={batch}")
    rng = np.random.default_rng(0)

    def chain_time(fn, x0, iters=20):
        @jax.jit
        def chain(x, n):
            def body(i, carry):
                x, acc = carry
                out = fn(x)
                x = (x.astype(jnp.float32) * (1.0 + out * 1e-30)).astype(
                    x.dtype)
                return x, acc + out

            _, acc = jax.lax.fori_loop(0, n, body, (x, 0.0))
            return acc

        jax.block_until_ready(chain(x0, 1))
        t0 = time.perf_counter()
        jax.block_until_ready(chain(x0, 1))
        a = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(chain(x0, iters))
        b = time.perf_counter() - t0
        return (b - a) / (iters - 1) * 1e3

    def vag(f, w, x):
        val, grads = jax.value_and_grad(f, argnums=(0, 1))(w, x)
        gsum = jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)),
            grads, 0.0)
        return (val + gsum) * 1e-12

    def bf16(a):
        return jax.device_put(np.asarray(a, np.float32)).astype(jnp.bfloat16)

    results = []

    def run(label, fwd_fn, fb_fn, x0):
        tf_ = chain_time(fwd_fn, x0)
        tb = chain_time(fb_fn, x0)
        d = tb - tf_
        results.append((label, tf_, tb, d))
        print(f"{label:34s} fwd {tf_:7.2f}  f+b {tb:7.2f}  "
              f"bwd {d:7.2f} ms ({d / max(tf_, 1e-9):3.1f}x)")

    # --- Full entry blocks at real geometry (relu_first matches model) ---
    BLOCKS = [
        ("entry0", 147, 64, 128, False),
        ("entry1", 74, 128, 256, True),
        ("entry2", 37, 256, 728, True),
    ]
    for name, hw, cin, cout, relu_first in BLOCKS:
        block = XceptionBlock((cout, cout), strides=2, relu_first=relu_first)
        x0 = bf16(rng.standard_normal((batch, hw, hw, cin)))
        variables = block.init(jax.random.PRNGKey(0), x0, train=True)
        params = jax.device_put(variables["params"])
        bstats = jax.device_put(variables["batch_stats"])

        def apply_block(p, x, block=block, bstats=bstats):
            y, _ = block.apply({"params": p, "batch_stats": bstats}, x,
                               train=True, mutable=["batch_stats"])
            return jnp.sum(y).astype(jnp.float32)

        run(f"block {name} {hw}x{hw}x{cin}->{cout} s2",
            lambda x, p=params, f=apply_block: f(p, x) * 1e-12,
            lambda x, p=params, f=apply_block: vag(f, p, x), x0)

    # --- Maxpool alone (SelectAndScatter bwd suspect) ---
    for hw, c in [(147, 128), (74, 256)]:
        x0 = bf16(rng.standard_normal((batch, hw, hw, c)))

        def pool(x):
            import flax.linen as nn

            return jnp.sum(
                nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
            ).astype(jnp.float32)

        run(f"pool {hw}x{hw}x{c} 3x3s2",
            lambda x: pool(x) * 1e-12,
            lambda x: (jax.value_and_grad(pool)(x)[0]
                       + jnp.sum(jnp.abs(jax.value_and_grad(pool)(x)[1])
                                 .astype(jnp.float32))) * 1e-12,
            x0)

    # --- Strided 1x1 residual conv alone ---
    x0 = bf16(rng.standard_normal((batch, 147, 147, 64)))
    w = bf16(rng.standard_normal((1, 1, 64, 128)) * 0.1)

    def resconv(w, x):
        return jnp.sum(jax.lax.conv_general_dilated(
            x, w, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))).astype(jnp.float32)

    run("res 147x147x64->128 1x1s2",
        lambda x: resconv(w, x) * 1e-12,
        lambda x: vag(resconv, w, x), x0)

    # --- Sep+BN unit at the entry0 geometries, iters=20 ---
    def sep_bn(ws, x):
        c = x.shape[-1]
        h = jax.lax.conv_general_dilated(
            x, ws["dw"], (1, 1), "SAME", feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.lax.conv_general_dilated(
            h, ws["pw"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        hf = h.astype(jnp.float32)
        mean = jnp.mean(hf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(hf), axis=(0, 1, 2)) - jnp.square(mean)
        y = (hf - mean) * jax.lax.rsqrt(var + 1e-3)
        return jnp.sum(y * ws["scale"] + ws["bias"]).astype(jnp.float32)

    for hw, cin, cout in [(147, 64, 128), (147, 128, 128), (74, 128, 256)]:
        x0 = bf16(rng.standard_normal((batch, hw, hw, cin)))
        ws = {
            "dw": bf16(rng.standard_normal((3, 3, 1, cin)) * 0.1),
            "pw": bf16(rng.standard_normal((1, 1, cin, cout)) * 0.05),
            "scale": jax.device_put(np.ones((cout,), np.float32)),
            "bias": jax.device_put(np.zeros((cout,), np.float32)),
        }
        run(f"unit {hw}x{hw}x{cin}->{cout} sep+bn",
            lambda x, ws=ws: sep_bn(ws, x) * 1e-12,
            lambda x, ws=ws: vag(sep_bn, ws, x), x0)

    print("\nsummary (label, fwd, f+b, bwd ms):")
    for r in results:
        print(f"  {r[0]:34s} {r[1]:7.2f} {r[2]:7.2f} {r[3]:7.2f}")


if __name__ == "__main__":
    main()
