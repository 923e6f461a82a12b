"""Real-chip benchmark: fused middle-flow Pallas kernel vs XLA convs.

Run on the v5e:  python benchmarks/bench_fused_sepconv.py [BATCH]

Measures the Xception middle flow alone (19x19x728, 8 blocks) — the
round-1-diagnosed trunk bottleneck — and checks numerics against the XLA
path. Inputs cycle through distinct random buffers (same-args-repeated
timing is unreliable on this stack; see CLAUDE.md).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=256):
    import jax
    import jax.numpy as jnp

    from biscuit_tpu.hp import nature2022_params
    from biscuit_tpu.models.xception import ARCHS, build_model
    from biscuit_tpu.ops.fused_sepconv import (
        fused_middle_flow,
        stack_middle_weights,
    )

    hp = nature2022_params()
    model = build_model(hp)
    cpu = jax.devices("cpu")[0]
    rng = jax.random.PRNGKey(0)
    with jax.default_device(cpu):
        variables = model.init(
            {"params": rng, "dropout": rng},
            jnp.zeros((2, 299, 299, 3), jnp.float32), train=False,
        )
    dev = jax.devices()[0]
    variables = jax.device_put(variables, dev)

    H = W = 19
    C = ARCHS["xception"]["middle_width"]
    n_bufs = 4

    def log(msg):
        print(msg, flush=True)

    log("generating inputs on device...")
    # Generate on-device: shipping n_bufs x 134 MB through the tunnel takes
    # many minutes; one tiny PRNG program does not.
    make = jax.jit(lambda k: jax.random.normal(
        k, (n_bufs, batch, H, W, C), jnp.bfloat16))
    stacked = make(jax.device_put(jax.random.PRNGKey(7), dev))
    jax.block_until_ready(stacked)
    xs = [stacked[i] for i in range(n_bufs)]
    log("inputs ready")

    xla_middle = jax.jit(
        lambda v, h: model.apply(v, h, train=False, method="trunk_middle")
    )
    wts = stack_middle_weights(
        variables["params"]["backbone"], variables["batch_stats"]["backbone"],
        ARCHS["xception"]["middle_repeats"],
    )
    wts = jax.device_put(wts, dev)
    fused = jax.jit(lambda h, w: fused_middle_flow(h, *w))

    # --- correctness ------------------------------------------------------
    log("compiling XLA middle...")
    a = np.asarray(xla_middle(variables, xs[0]), np.float32)
    log("compiling fused kernel...")
    b = np.asarray(fused(xs[0], wts), np.float32)
    scale = np.abs(a).mean()
    rel = np.abs(a - b).mean() / scale
    print(f"parity: out scale {scale:.3f}  mean rel err {rel:.5f}  "
          f"max abs {np.abs(a - b).max():.4f}")
    assert rel < 0.02, "fused middle flow diverges from XLA path"

    # --- timing -----------------------------------------------------------
    def timeit(fn, *extra, iters=12):
        outs = [fn(x, *extra) for x in xs]
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        outs = [fn(xs[i % n_bufs], *extra) for i in range(iters)]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / iters

    t_xla = timeit(lambda x: xla_middle(variables, x))
    t_fused = timeit(fused, wts)
    flops = 2 * batch * H * W * C * 24 * (9 + C)
    print(f"B={batch}  XLA middle:   {t_xla*1e3:8.3f} ms "
          f"({flops/t_xla/1e12:6.2f} TFLOP/s)")
    print(f"B={batch}  fused middle: {t_fused*1e3:8.3f} ms "
          f"({flops/t_fused/1e12:6.2f} TFLOP/s)  "
          f"speedup {t_xla/t_fused:5.2f}x")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
