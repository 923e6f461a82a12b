"""Fused unit-backward kernel vs XLA autodiff, per trunk geometry.

Gate for ops/fused_unit_bwd.py: chained fwd+bwd timing of the sep+BN
unit under (a) plain jax autodiff and (b) the custom-vjp fused backward
(Pallas kernel + XLA BN-sums pre-pass), at every geometry the Xception
trunk trains: entry0 (both units), entry1, entry2, middle, exit.

Chained in-jit timing with data dependence (CLAUDE.md: independent
dispatches lie through the tunnel). BENCH_BACKEND=pallas|pallas_strips
selects the kernel design. Measured verdict (v5e, B=128): BOTH designs
lose 0.40-0.70x to XLA autodiff at every trunk geometry — full table
and root-cause analysis in ops/fused_unit_bwd.py's STATUS record.

Run: python benchmarks/bench_unit_bwd.py [batch] [geom_substr ...]
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

    from biscuit_tpu.ops import fused_unit_bwd as fub

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

    GEOMS = [
        ("entry0u0", 147, 64, 128, False),
        ("entry0u1", 147, 128, 128, True),
        ("entry1u0", 74, 128, 256, True),
        ("entry1u1", 74, 256, 256, True),
        ("entry2u0", 37, 256, 728, True),
        ("entry2u1", 37, 728, 728, True),
        ("middle", 19, 728, 728, True),
        ("exitu1", 19, 728, 1024, True),
    ]
    eps = 1e-5
    sel = sys.argv[2:]
    geoms = [g for g in GEOMS if not sel or any(s in g[0] for s in sel)]

    for name, hw, ci, co, relu_first in geoms:
        a0 = jax.device_put(
            rng.standard_normal((batch, hw, hw, ci)).astype(np.float32)
        ).astype(jnp.bfloat16)
        wdw = jax.device_put(
            (rng.standard_normal((3, 3, 1, ci)) * 0.2).astype(np.float32))
        wpw = jax.device_put(
            (rng.standard_normal((1, 1, ci, co)) * 0.05).astype(np.float32))
        gam = jax.device_put(np.ones((co,), np.float32))
        bet = jax.device_put(np.zeros((co,), np.float32))

        def autodiff_fb(a, wdw=wdw, wpw=wpw, gam=gam, bet=bet,
                        relu_first=relu_first):
            def loss(a, wdw, wpw, gam, bet):
                y, mu, var, _ = fub.unit_fwd(a, wdw, wpw, gam, bet, eps,
                                             relu_first)
                return jnp.sum(y.astype(jnp.float32))
            val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
                a, wdw, wpw, gam, bet)
            gsum = jax.tree_util.tree_reduce(
                lambda s, t: s + jnp.sum(jnp.abs(t).astype(jnp.float32)),
                grads, 0.0)
            return (val + gsum) * 1e-12

        backend = os.environ.get("BENCH_BACKEND", "pallas")

        def fused_fb(a, wdw=wdw, wpw=wpw, gam=gam, bet=bet,
                     relu_first=relu_first, backend=backend):
            def loss(a, wdw, wpw, gam, bet):
                y, mu, var = fub.sep_bn_unit(a, wdw, wpw, gam, bet, eps,
                                             relu_first, backend)
                return jnp.sum(y.astype(jnp.float32))
            val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
                a, wdw, wpw, gam, bet)
            gsum = jax.tree_util.tree_reduce(
                lambda s, t: s + jnp.sum(jnp.abs(t).astype(jnp.float32)),
                grads, 0.0)
            return (val + gsum) * 1e-12

        t_auto = chain_time(autodiff_fb, a0)
        t_fused = chain_time(fused_fb, a0)
        print(f"{name:9s} {hw}x{hw}x{ci}->{co} "
              f"autodiff {t_auto:7.2f}  fused {t_fused:7.2f}  "
              f"speedup {t_auto / max(t_fused, 1e-9):4.2f}x")


if __name__ == "__main__":
    main()
