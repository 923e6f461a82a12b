"""Real-chip stage breakdown of the UQ inference step.

Run on the v5e:  python benchmarks/bench_trunk_stages.py [BATCH]

Methodology: per-stage timing of individual jitted calls is corrupted by
the per-call dispatch overhead of the remote (axon tunnel) setup (~tens of
ms/call — measured head-only time was 20x its compute). Instead, time
composed PREFIXES of the pipeline (pre, pre+entry, pre+entry+middle, ...)
— each prefix is one jit program, so per-call overhead is identical and
the prefix DIFFERENCES are clean per-stage compute times.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=256):
    import jax
    import jax.numpy as jnp

    from biscuit_tpu.data.normalize import (
        make_normalizer,
        per_image_standardization,
    )
    from biscuit_tpu.hp import nature2022_params
    from biscuit_tpu.models.xception import ARCHS, build_model
    from biscuit_tpu.ops.fused_sepconv import (
        fused_middle_flow,
        stack_middle_weights,
    )
    from biscuit_tpu.train.uq import mc_dropout_head

    def log(msg):
        print(msg, flush=True)

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
    params, batch_stats = variables["params"], variables["batch_stats"]
    normalizer = make_normalizer(hp.normalizer)

    n_bufs = 3
    log("generating inputs on device...")
    mk = jax.jit(lambda k: jax.random.randint(
        k, (n_bufs, batch, 299, 299, 3), 0, 255, jnp.int32
    ).astype(jnp.uint8))
    imgs = mk(jax.device_put(jax.random.PRNGKey(7), dev))
    jax.block_until_ready(imgs)
    imgs = [imgs[i] for i in range(n_bufs)]

    wts = jax.device_put(stack_middle_weights(
        params["backbone"], batch_stats["backbone"],
        ARCHS["xception"]["middle_repeats"]), dev)

    def pre(u8):
        return per_image_standardization(normalizer(u8.astype(jnp.float32)))

    def entry(x):
        return model.apply(variables, x, train=False, method="trunk_entry")

    def mid_xla(h):
        return model.apply(variables, h, train=False, method="trunk_middle")

    def mid_fused(h):
        return fused_middle_flow(h, *wts)

    def exitf(h):
        return model.apply(variables, h, train=False, method="trunk_exit")

    def head(feats, key):
        return mc_dropout_head(model, params, batch_stats, feats, key, k=30)

    from biscuit_tpu.ops.fused_preprocess import fused_preprocess
    from biscuit_tpu.ops.fused_sepconv import trunk_features_fused

    def pre_f(u8):
        return fused_preprocess(u8, normalizer).astype(jnp.float32)

    key = jax.random.PRNGKey(3)
    prefixes = {
        "null": lambda u8: u8[0, 0, 0, :],
        "pre": lambda u8: pre(u8),
        "preF (fused)": lambda u8: pre_f(u8),
        "pre+entry": lambda u8: entry(pre(u8)),
        "pre+entry+midX": lambda u8: mid_xla(entry(pre(u8))),
        "pre+entry+midF": lambda u8: mid_fused(entry(pre(u8))),
        "...midF+exit": lambda u8: exitf(mid_fused(entry(pre(u8)))),
        "full (fused)": lambda u8: head(
            exitf(mid_fused(entry(pre(u8)))), key),
        "full (preF+blocks)": lambda u8: head(
            trunk_features_fused(model, params, batch_stats, pre_f(u8),
                                 fuse_blocks=True), key),
    }

    def timeit(fn, iters=12):
        f = jax.jit(fn)
        out = None
        for u in imgs:
            out = f(u)
        jax.block_until_ready(out)
        # Keep only the newest output reference: the async queue drains
        # while older buffers free, so B=1024 f32 activations don't
        # accumulate 12x in HBM.
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(imgs[i % n_bufs])
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    log(f"--- pipeline prefixes at B={batch} ---")
    times = {}
    for name, fn in prefixes.items():
        times[name] = timeit(fn)
        log(f"{name:18s} {times[name]*1e3:8.3f} ms")

    log("--- stage deltas (dispatch overhead cancelled) ---")
    deltas = {
        "dispatch overhead": times["null"],
        "preprocess": times["pre"] - times["null"],
        "preprocess fused": times["preF (fused)"] - times["null"],
        "entry": times["pre+entry"] - times["pre"],
        "middle XLA": times["pre+entry+midX"] - times["pre+entry"],
        "middle fused": times["pre+entry+midF"] - times["pre+entry"],
        "exit": times["...midF+exit"] - times["pre+entry+midF"],
        "head K=30": times["full (fused)"] - times["...midF+exit"],
    }
    for name, dt in deltas.items():
        log(f"{name:18s} {dt*1e3:8.3f} ms")
    total = times["full (fused)"] - times["null"]
    log(f"full fused pipeline: {total*1e3:.1f} ms -> {batch/total:.0f} t/s "
        f"(ex-dispatch)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
