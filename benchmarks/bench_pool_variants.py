"""Maxpool 3x3/s2/SAME formulation shootout (fwd + bwd), entry geometries.

bench_bwd_entry.py measured nn.max_pool (lax.reduce_window) at 3.85 ms fwd
for 147x147x128 B=128 — 3.6x off the ~1.1 ms HBM roofline (708 MB in +
177 MB out at ~819 GB/s) — and its SelectAndScatter backward at 4.54 ms.
The pools sit in BOTH hot paths: the training entry flow (~8 ms/step of
the 140 ms step) and the inference entry flow (~50 ms of the ~247 ms
B=1024 headline batch). This measures alternative formulations:

  fwd:
    rw      nn.max_pool (lax.reduce_window)           [baseline]
    sh9     max of 9 statically shifted strided slices of a -inf pad
    sep     two reduce_windows (1x3 then 3x1)
    shsep   shifted-slice separable (3 col slices, then 3 row slices)
  bwd:
    rw autodiff      SelectAndScatter                  [baseline]
    sh9 autodiff     chained-maximum selects + slice-grads (pad, no
                     scatter: the VJP of a strided slice is a dilated pad)
    eqsplit custom   equality-mask redistribute with tie-splitting
                     (grad of a tied max is split equally — a valid
                     subgradient; XLA gives it all to the first max)

Chained in-jit timing (CLAUDE.md: independent dispatches lie through the
tunnel).

Measured (v5e, B=128, r3, iters=20) — reduce_window WINS everything;
the reformulation lever is CLOSED:

    147x147x128   rw fwd 3.99 bwd  3.14 | sh9 4.36/49.6 | sep 4.51/5.43
                  | shsep 5.08/31.8 | eqsplit bwd 99.4
    74x74x256     rw fwd 1.37 bwd  2.77 | sh9 2.11/22.4 | sep 2.33/2.11
                  | shsep 2.65/13.4 | eqsplit bwd 49.9
    37x37x728     rw fwd 1.22 bwd  1.49 | sh9 1.45/15.5 | sep 1.64/2.04
                  | shsep 1.92/ 8.5 | eqsplit bwd 36.6

Conclusions:
* XLA's reduce_window fwd, though ~3.6x off the HBM roofline, beats all
  shifted-slice formulations: strided lane/sublane slices lower to
  relayout chains that cost far more than the windowed reads; their
  VJPs (dilated pads / equality-mask redistribution) are catastrophic
  (7-30x worse than SelectAndScatter).
* SelectAndScatter (rw bwd) is likewise the best available backward.
* nn.max_pool stays the pool implementation in models/xception.py and
  train/fused_train.py; the remaining pool gap is reachable only by
  fusing the pool into a producing Pallas kernel (fused_block.py does
  this for inference; its measured record shows the block's depthwise
  VPU floor, not the pool, dominates).

Run: python benchmarks/bench_pool_variants.py [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    print(f"device={jax.devices()[0].device_kind} batch={batch}")
    rng = np.random.default_rng(0)

    NEG = jnp.asarray(-jnp.inf, jnp.bfloat16)

    def pool_rw(x):
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

    def _out_len(n):
        return (n + 1) // 2

    def pool_sh9(x):
        # SAME for k=3 s=2: pad 1 both sides (odd n), out=(n+1)//2.
        n, h, w, c = x.shape
        oh, ow = _out_len(h), _out_len(w)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=NEG)
        y = None
        for dy in range(3):
            for dx in range(3):
                s = jax.lax.slice(
                    xp, (0, dy, dx, 0),
                    (n, dy + 2 * (oh - 1) + 1, dx + 2 * (ow - 1) + 1, c),
                    (1, 2, 2, 1))
                y = s if y is None else jnp.maximum(y, s)
        return y

    def pool_sep(x):
        h = nn.max_pool(x, (1, 3), strides=(1, 2), padding="SAME")
        return nn.max_pool(h, (3, 1), strides=(2, 1), padding="SAME")

    def pool_shsep(x):
        n, h, w, c = x.shape
        oh, ow = _out_len(h), _out_len(w)
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)),
                     constant_values=NEG)
        r = None
        for dx in range(3):
            s = jax.lax.slice(xp, (0, 0, dx, 0),
                              (n, h, dx + 2 * (ow - 1) + 1, c),
                              (1, 1, 2, 1))
            r = s if r is None else jnp.maximum(r, s)
        rp = jnp.pad(r, ((0, 0), (1, 1), (0, 0), (0, 0)),
                     constant_values=NEG)
        y = None
        for dy in range(3):
            s = jax.lax.slice(rp, (0, dy, 0, 0),
                              (n, dy + 2 * (oh - 1) + 1, ow, c),
                              (1, 2, 1, 1))
            y = s if y is None else jnp.maximum(y, s)
        return y

    # --- equality-split custom-vjp pool (fwd = sh9) ---
    @jax.custom_vjp
    def pool_eq(x):
        return pool_sh9(x)

    def pool_eq_fwd(x):
        y = pool_sh9(x)
        return y, (x, y)

    def pool_eq_bwd(res, g):
        x, y = res
        n, h, w, c = x.shape
        oh, ow = _out_len(h), _out_len(w)
        # Dilate y and g back to the padded input grid: position (2i, 2j)
        # in the padded frame holds window (i, j).
        pad_cfg = [(0, 0, 0), (0, (h + 2) - (2 * (oh - 1) + 1), 1),
                   (0, (w + 2) - (2 * (ow - 1) + 1), 1), (0, 0, 0)]
        y_d = jax.lax.pad(y, NEG, pad_cfg)
        g_d = jax.lax.pad(g.astype(jnp.float32),
                          jnp.asarray(0.0, jnp.float32), pad_cfg)
        # Tie count per window: 9-tap reduce of (x == y) at window centers.
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=NEG)
        cnt = None
        for dy in range(3):
            for dx in range(3):
                s = jax.lax.slice(
                    xp, (0, dy, dx, 0),
                    (n, dy + 2 * (oh - 1) + 1, dx + 2 * (ow - 1) + 1, c),
                    (1, 2, 2, 1))
                e = (s == y).astype(jnp.float32)
                cnt = e if cnt is None else cnt + e
        gshare = g.astype(jnp.float32) / cnt
        gs_d = jax.lax.pad(gshare, jnp.asarray(0.0, jnp.float32), pad_cfg)
        # Each padded-input position p receives from windows at p - d.
        dxp = jnp.zeros((n, h + 2, w + 2, c), jnp.float32)
        xq = xp
        for dy in range(3):
            for dx in range(3):
                # window value + grad aligned so that padded index p
                # matches window start p - (dy, dx)
                yw = jnp.roll(y_d, (dy, dx), axis=(1, 2))
                gw = jnp.roll(gs_d, (dy, dx), axis=(1, 2))
                dxp = dxp + jnp.where(xq == yw, gw, 0.0)
        del g_d
        return (dxp[:, 1:h + 1, 1:w + 1, :].astype(x.dtype),)

    pool_eq.defvjp(pool_eq_fwd, pool_eq_bwd)

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

    def fwd_fn(pool):
        return lambda x: jnp.sum(pool(x)).astype(jnp.float32) * 1e-12

    def fb_fn(pool):
        def f(x):
            val, g = jax.value_and_grad(
                lambda xx: jnp.sum(pool(xx)).astype(jnp.float32))(x)
            return (val + jnp.sum(jnp.abs(g).astype(jnp.float32))) * 1e-12
        return f

    GEOMS = [(147, 128), (74, 256), (37, 728)]
    pools = [("rw", pool_rw), ("sh9", pool_sh9), ("sep", pool_sep),
             ("shsep", pool_shsep), ("eq", pool_eq)]

    # correctness check on small input (CPU-friendly shapes still run on
    # device here; compare all variants against reduce_window)
    xs = jax.device_put(
        rng.standard_normal((2, 13, 13, 8)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ref = pool_rw(xs)
    for name, p in pools[1:]:
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(p(xs)),
                                      err_msg=name)
    print("fwd parity ok (13x13 fixture)")

    for hw, c in GEOMS:
        x0 = jax.device_put(
            rng.standard_normal((batch, hw, hw, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        print(f"-- {hw}x{hw}x{c} (B={batch})")
        for name, p in pools:
            tf_ = chain_time(fwd_fn(p), x0)
            tb = chain_time(fb_fn(p), x0)
            print(f"   {name:6s} fwd {tf_:7.2f}  f+b {tb:7.2f}  "
                  f"bwd {tb - tf_:7.2f} ms")


if __name__ == "__main__":
    main()
