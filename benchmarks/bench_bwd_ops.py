"""Per-op backward costs at Xception geometries (bwd-lever analysis).

bench_train_step.py puts bwd+update at 96 of 140 ms (B=128); this answers
*which ops* own that time, by measuring fwd and fwd+bwd of each layer type
in isolation at the geometries that dominate the trunk:

  entry:  147x147x64 -> sep(128)   (the traffic-heavy early sepconv)
  entry2: 37x37x256  -> sep(728)
  middle: 19x19x728  -> sep(728)   (x24 units in the real model)
  exit:   10x10x1024 -> sep(1536)

For each geometry: depthwise-only, pointwise-only, BN(train)-only, and the
full sep+BN unit — fwd vs value_and_grad(fwd). The delta is that op's
backward (dgrad + wgrad). Chained in-jit timing with data dependence
(CLAUDE.md: independent dispatches lie through the tunnel).

Measured (v5e, B=128, r3): the iters=4 chains here are noise-limited at
~+-1-2 ms through the tunnel, so only the multi-ms rows are meaningful:
stem convs are cheap (conv1 fwd 0.08, conv2 fwd 1.76, both bwd <0.5 ms);
the entry0 sep+BN unit is the standout (fwd 3.88, f+b 11.36 -> bwd 7.48
ms). bench_bwd_entry.py re-measures at iters=20 with composition-level
cases and carries the authoritative numbers.

Run: python benchmarks/bench_bwd_ops.py [batch]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    import jax
    import jax.numpy as jnp

    print(f"device={jax.devices()[0].device_kind} batch={batch}")

    GEOMS = [
        ("entry0", 147, 64, 128),
        ("entry1", 74, 128, 256),
        ("entry2", 37, 256, 728),
        ("middle", 19, 728, 728),
    ]

    # Stem convs (dense 3x3), the small-channel suspects: conv1 is
    # 299x299x3 -> 32 stride 2 VALID; conv2 is 149x149x32 -> 64 VALID.
    STEM = [
        ("conv1", 299, 3, 32, 2),
        ("conv2", 149, 32, 64, 1),
    ]

    def dw_apply(w, x):
        c = x.shape[-1]
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def pw_apply(w, x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def bn_apply(p, x):
        # train-mode BN: batch statistics participate in the graph
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-3)
        return (y * p["scale"] + p["bias"]).astype(x.dtype)

    def chain_time(fn, args_x, iters=4):
        """fn(x) -> scalar; serialized x-dependent chain."""

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

        jax.block_until_ready(chain(args_x, 1))
        t0 = time.perf_counter()
        jax.block_until_ready(chain(args_x, 1))
        a = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(chain(args_x, iters))
        b = time.perf_counter() - t0
        return (b - a) / (iters - 1) * 1e3

    rng = np.random.default_rng(0)

    def chain_time_named(fn, x, label):
        t = chain_time(fn, x)
        print(f"   {label:10s} {t:8.2f} ms")
        return t

    for name, hw, cin, cout, stride in STEM:
        x0 = jax.device_put(
            rng.standard_normal((batch, hw, hw, cin)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jax.device_put(
            (rng.standard_normal((3, 3, cin, cout)) * 0.1).astype(np.float32)
        ).astype(jnp.bfloat16)

        def conv_apply(w, x, stride=stride):
            return jax.lax.conv_general_dilated(
                x, w, (stride, stride), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def fwd(x):
            return jnp.sum(conv_apply(w, x)).astype(jnp.float32) * 1e-12

        def fb(x):
            (val, grads) = jax.value_and_grad(
                lambda ww, xx: jnp.sum(conv_apply(ww, xx)).astype(
                    jnp.float32), argnums=(0, 1))(w, x)
            gsum = jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)),
                grads, 0.0)
            return (val + gsum) * 1e-12

        def fb_wonly(x):
            (val, g) = jax.value_and_grad(
                lambda ww: jnp.sum(conv_apply(ww, x)).astype(jnp.float32)
            )(w)
            return (val + jnp.sum(jnp.abs(g).astype(jnp.float32))) * 1e-12

        def fb_xonly(x):
            (val, g) = jax.value_and_grad(
                lambda xx: jnp.sum(conv_apply(w, xx)).astype(jnp.float32)
            )(x)
            return (val + jnp.sum(jnp.abs(g).astype(jnp.float32))) * 1e-12

        print(f"-- stem {name}: {hw}x{hw}x{cin} -> {cout} s{stride} "
              f"(B={batch})")
        tf_ = chain_time_named(fwd, x0, "fwd")
        chain_time_named(fb_wonly, x0, "f+wgrad")
        chain_time_named(fb_xonly, x0, "f+dgrad")
        tb = chain_time_named(fb, x0, "f+b")
        print(f"   bwd = {tb - tf_:7.2f} ms ({(tb - tf_) / max(tf_, 1e-9):4.1f}x fwd)")

    for name, hw, cin, cout in GEOMS:
        x0 = jax.device_put(
            rng.standard_normal((batch, hw, hw, cin)).astype(np.float32)
        ).astype(jnp.bfloat16)
        dw_w = jax.device_put(
            (rng.standard_normal((3, 3, 1, cin)) * 0.1).astype(np.float32)
        ).astype(jnp.bfloat16)
        pw_w = jax.device_put(
            (rng.standard_normal((1, 1, cin, cout)) * 0.05).astype(np.float32)
        ).astype(jnp.bfloat16)
        bn_p = {
            "scale": jax.device_put(np.ones((cout,), np.float32)),
            "bias": jax.device_put(np.zeros((cout,), np.float32)),
        }
        bn_p_in = {
            "scale": jax.device_put(np.ones((cin,), np.float32)),
            "bias": jax.device_put(np.zeros((cin,), np.float32)),
        }

        cases = {}

        # depthwise alone
        cases["dw fwd"] = lambda x: jnp.sum(dw_apply(dw_w, x)).astype(
            jnp.float32) * 1e-12
        cases["dw f+b"] = lambda x: _vag(
            lambda w, xx: jnp.sum(dw_apply(w, xx)).astype(jnp.float32),
            dw_w, x) * 1e-12
        cases["dw f+w"] = lambda x: _vag1(
            lambda w: jnp.sum(dw_apply(w, x)).astype(jnp.float32),
            dw_w) * 1e-12
        cases["dw f+d"] = lambda x: _vag1(
            lambda xx: jnp.sum(dw_apply(dw_w, xx)).astype(jnp.float32),
            x) * 1e-12
        # pointwise alone
        cases["pw fwd"] = lambda x: jnp.sum(pw_apply(pw_w, x)).astype(
            jnp.float32) * 1e-12
        cases["pw f+b"] = lambda x: _vag(
            lambda w, xx: jnp.sum(pw_apply(w, xx)).astype(jnp.float32),
            pw_w, x) * 1e-12
        # BN(train) alone (on cin-width input)
        cases["bn fwd"] = lambda x: jnp.sum(bn_apply(bn_p_in, x)).astype(
            jnp.float32) * 1e-12
        cases["bn f+b"] = lambda x: _vag(
            lambda p, xx: jnp.sum(bn_apply(p, xx)).astype(jnp.float32),
            bn_p_in, x) * 1e-12

        # full unit: relu -> dw -> pw -> bn
        def unit(ws, x):
            h = jax.nn.relu(x)
            h = dw_apply(ws["dw"], h)
            h = pw_apply(ws["pw"], h)
            return bn_apply(ws["bn"], h)

        ws = {"dw": dw_w, "pw": pw_w, "bn": bn_p}
        cases["unit fwd"] = lambda x: jnp.sum(unit(ws, x)).astype(
            jnp.float32) * 1e-12
        cases["unit f+b"] = lambda x: _vag(
            lambda w, xx: jnp.sum(unit(w, xx)).astype(jnp.float32),
            ws, x) * 1e-12

        def _vag(f, w, x):
            (val, grads) = jax.value_and_grad(f, argnums=(0, 1))(w, x)
            gsum = jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)),
                grads, 0.0)
            return val + gsum

        def _vag1(f, v):
            (val, g) = jax.value_and_grad(f)(v)
            gsum = jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)),
                g, 0.0)
            return val + gsum

        print(f"-- {name}: {hw}x{hw}x{cin} -> {cout} (B={batch})")
        res = {}
        for label, fn in cases.items():
            res[label] = chain_time(fn, x0)
            print(f"   {label:10s} {res[label]:8.2f} ms")
        for op in ("dw", "pw", "bn", "unit"):
            d = res[f"{op} f+b"] - res[f"{op} fwd"]
            r = d / max(res[f"{op} fwd"], 1e-9)
            print(f"   {op:5s} bwd = {d:7.2f} ms ({r:4.1f}x fwd)")


if __name__ == "__main__":
    main()
