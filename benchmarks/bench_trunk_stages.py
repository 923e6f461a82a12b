"""Real-chip stage breakdown of the UQ inference step.

Run on the v5e:  python benchmarks/bench_trunk_stages.py [BATCH]

Times entry / middle(XLA) / middle(fused) / exit / K=30 head separately and
the composed uq_step, to target the next kernel (VERDICT r1: trunk is the
bottleneck; which stage?).
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

    C = ARCHS["xception"]["middle_width"]
    mk2 = jax.jit(lambda k: jax.random.normal(
        k, (n_bufs, batch, 19, 19, C), jnp.bfloat16))
    mids = mk2(jax.device_put(jax.random.PRNGKey(8), dev))
    jax.block_until_ready(mids)
    mids = [mids[i] for i in range(n_bufs)]

    wts = jax.device_put(stack_middle_weights(
        params["backbone"], batch_stats["backbone"],
        ARCHS["xception"]["middle_repeats"]), dev)

    pre = jax.jit(lambda u8: per_image_standardization(
        normalizer(u8.astype(jnp.float32))))
    entry = jax.jit(lambda v, x: model.apply(
        v, x, train=False, method="trunk_entry"))
    middle_xla = jax.jit(lambda v, h: model.apply(
        v, h, train=False, method="trunk_middle"))
    middle_fused = jax.jit(lambda h, w: fused_middle_flow(h, *w))
    exitf = jax.jit(lambda v, h: model.apply(
        v, h, train=False, method="trunk_exit"))

    def head_fn(p, bs, feats, key):
        return mc_dropout_head(model, p, bs, feats, key, k=30)

    head = jax.jit(head_fn)

    def timeit(name, fn, args_list, iters=9):
        outs = [fn(*a) for a in args_list]
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        outs = [fn(*args_list[i % len(args_list)]) for i in range(iters)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / iters
        log(f"{name:18s} {dt*1e3:8.3f} ms")
        return dt

    log(f"--- stages at B={batch} ---")
    xs = [pre(u) for u in imgs]
    jax.block_until_ready(xs)
    t_pre = timeit("preprocess", pre, [(u,) for u in imgs])
    hs = [entry(variables, x) for x in xs]
    jax.block_until_ready(hs)
    t_entry = timeit("entry", entry, [(variables, x) for x in xs])
    t_mid_x = timeit("middle XLA", middle_xla, [(variables, m) for m in mids])
    t_mid_f = timeit("middle fused", middle_fused, [(m, wts) for m in mids])
    ms = [middle_fused(m, wts) for m in mids]
    t_exit = timeit("exit", exitf, [(variables, m) for m in ms])
    feats = [exitf(variables, m) for m in ms]
    jax.block_until_ready(feats)
    keys = jax.random.split(jax.random.PRNGKey(3), len(feats))
    t_head = timeit(
        "head K=30", head,
        [(params, batch_stats, f, k) for f, k in zip(feats, keys)],
    )
    total_fused = t_pre + t_entry + t_mid_f + t_exit + t_head
    total_xla = t_pre + t_entry + t_mid_x + t_exit + t_head
    log(f"sum fused: {total_fused*1e3:.1f} ms -> {batch/total_fused:.0f} t/s")
    log(f"sum xla:   {total_xla*1e3:.1f} ms -> {batch/total_xla:.0f} t/s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
