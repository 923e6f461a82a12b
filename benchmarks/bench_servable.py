"""Measure the deserialized AOT servable's throughput on the real chip.

Question: does a `biscuit_tpu.serve` artifact (weights + preprocess +
fused trunk + K=30 MC-dropout head baked into one jax.export program,
then deserialized cold in a fresh process context) serve at the live
headline rate (bench.py), or does export/deserialize cost performance
(e.g. lost donation/layout opportunities, constant-folding differences)?

Methodology matches the repo convention (CLAUDE.md gotchas +
bench_int8_probe.py lessons): fresh never-repeated device-resident
inputs per timed dispatch, one fetched scalar fencing EVERY output,
fence overhead measured on pre-materialized buffers and subtracted.

Run on the chip:  python benchmarks/bench_servable.py [BATCH]

RESULT (v5e, B=1024, K=30, 2026-08-19): NO export penalty.
    servable (deserialized) : 239.55 ms/batch = 4,274.6 tiles/s
    live headline (bench.py): 4,151 tiles/s (same chip, same day,
                              bench.py's own methodology)
The +3% is methodology/tunnel-day variance, not a real win — the claim
this records is parity: deserialized artifacts serve at the headline
rate. One HBM caveat, also measured: the exported program's baked
constants + missing buffer reuse cost HBM headroom at B=1024 — the
probe could NOT keep even 5 staged 274 MB input buffers resident
(RESOURCE_EXHAUSTED; the live program tolerates more). Hence the
streamed-input methodology below, and the deployment guidance: at
B=1024 feed the servable a couple of batches ahead, not a deep
device-resident queue.
"""

from __future__ import annotations

import functools
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from biscuit_tpu.ops.threshold_device import (  # noqa: E402
    _enable_persistent_compile_cache,
)

_enable_persistent_compile_cache()

# The B=1024 K=30 program fills most of HBM (live bench: 2048 OOMs), so
# pre-staging N resident 274 MB input buffers OOMs too (measured: both 9
# and 5 buffers died). Instead each timed dispatch gets a FRESH input
# generated on device immediately before it (never-repeat-args rule
# satisfied with only ~2 input buffers live); the generator loop is timed
# separately with the same fence discipline and subtracted.
ITERS = 8


@jax.jit
def _fence_reduce(ys):
    return functools.reduce(
        jnp.add, [jnp.sum(y[0].astype(jnp.float32))
                  + jnp.sum(y[1].astype(jnp.float32)) for y in ys])


def _fence(ys):
    return float(_fence_reduce(list(ys)))


@jax.jit
def _fence_sums(xs):
    return functools.reduce(
        jnp.add, [jnp.sum(x.astype(jnp.float32)) for x in xs])


def main(batch=1024):
    from biscuit_tpu import serve
    from biscuit_tpu.hp import nature2022_params
    from biscuit_tpu.models.xception import build_model
    from biscuit_tpu.train.trainer import init_model, save_checkpoint

    print(f"backend={jax.default_backend()} B={batch}", flush=True)
    hp = nature2022_params()
    model = build_model(hp)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params, batch_stats = init_model(model, hp, jax.random.PRNGKey(0))

    with tempfile.TemporaryDirectory() as tmp:
        sub = save_checkpoint(tmp, params, batch_stats, hp, epoch=1,
                              outcome="cohort", label="bench", kfold=None)
        print("exporting servable...", flush=True)
        path = serve.export_servable(sub, batch_size=batch)
        import os

        print(f"artifact: {os.path.getsize(path)/1e6:.1f} MB", flush=True)
        sv = serve.load_servable(path)

    gen = jax.jit(lambda k: jax.random.randint(
        k, (batch, hp.tile_px, hp.tile_px, 3), 0, 256, dtype=jnp.uint8))
    gkeys = [jax.random.PRNGKey(7 + i) for i in range(2 * ITERS + 2)]
    keys = [jax.random.PRNGKey(100 + i) for i in range(ITERS + 1)]
    print("compiling generator + served program...", flush=True)

    x0 = gen(gkeys[-1])
    warm = sv.call_exact(x0, key=keys[-1])
    _fence([warm] * ITERS)
    del x0

    # Generator-loop cost, same in-order fence discipline. Each generated
    # buffer is reduced to a fetched scalar (its only consumer), so at
    # most one 274 MB input is live; the reduction adds one HBM read per
    # buffer (~0.3 ms) that the serve loop doesn't pay — a <0.2% bias
    # toward UNDERstating per-batch serve time, noted here.
    # Fused uint8 sum (materializing .astype(f32) would be a 1.1 GB
    # transient per buffer).
    sum_u8 = jax.jit(lambda x: jnp.sum(x, dtype=jnp.float32))
    _fence_sums([jnp.asarray(0.0, jnp.float32)] * ITERS)  # compile n-ary
    xw = gen(gkeys[-2])
    float(sum_u8(xw))  # compile the u8 reducer outside the timed window
    del xw
    t0 = time.perf_counter()
    float(_fence_sums([sum_u8(gen(gkeys[i])) for i in range(ITERS)]))
    gen_dt = time.perf_counter() - t0

    t0 = time.perf_counter()
    outs = []
    for i in range(ITERS):
        x = gen(gkeys[ITERS + i])
        outs.append(sv.call_exact(x, key=keys[i]))
        del x  # freed on device once serve dispatch i completes (in-order)
    _fence(outs)
    dt = time.perf_counter() - t0 - gen_dt
    per_batch = dt / ITERS
    print(f"generator loop: {gen_dt/ITERS*1e3:6.2f} ms/batch (subtracted)",
          flush=True)
    print(f"servable: {per_batch*1e3:8.2f} ms/batch  "
          f"{batch/per_batch:8.1f} tiles/s  (K=30, {hp.tile_px}px)",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
