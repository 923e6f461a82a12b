"""Single-dispatch serving latency of the AOT servable vs batch size.

bench_servable.py answers the THROUGHPUT question (pipelined dispatches,
fence at the end): an artifact serves at the live headline rate at
B=1024. This probe answers the LATENCY question a deployment has to ask
when picking the export batch size: how long from "tiles are on the
device" to "results are on the host" for ONE un-pipelined dispatch, per
batch size — the number an interactive caller (pathologist viewer,
per-slide scoring with small remainders) actually waits.

Methodology (CLAUDE.md gotchas):
* Each timed dispatch gets a FRESH device-generated input, materialized
  (fetched-scalar fence on the input sum) BEFORE t0 — the timed window
  is exactly dispatch -> compute -> fetch of both outputs, no input
  generation and no host->device upload inside it.
* Inputs never repeat across timed iterations (dispatch-cache artifact).
* The tunnel round-trip floor is measured separately (fetch of a tiny
  one-op program) and reported alongside: on this dev setup every
  number includes one tunnel RTT that a co-located TPU-VM host does not
  pay; subtract the floor for the co-located estimate.

Run on the chip (one process, all batch sizes — programs are small
enough to coexist; B=1024's input is generated fresh per iteration so
at most one 274 MB buffer is live):

    python benchmarks/bench_serving_latency.py [B ...]

RESULT (v5e via tunnel, K=30, 299px, 2026-08-19; tunnel RTT floor
25.7 ms min / 26.9 ms median — the minus-RTT column is the co-located
estimate):

    B     min ms   median ms   minus-RTT ms   single-inflight tiles/s
    8      25.47       27.43        ~0 (<1)       314
    32     31.46       32.35         5.7         1017
    128    54.55       55.85        28.8         2346
    512   145.16      146.46       119.4         3527
    1024  266.13      267.95       240.4         3848

Cross-check: B=1024 minus-RTT (240.4 ms) matches bench_servable.py's
pipelined 239.6 ms/batch — the dispatch is compute-bound at large B and
RTT-bound below B~64. Co-located deployment guidance: a B=128 artifact
answers in <30 ms at 57% of peak throughput; B=1024 is for batch
scoring (pipelined: 4,275 tiles/s), not interactive use.
"""

from __future__ import annotations

import os
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

ITERS = 10
DEFAULT_BATCHES = (8, 32, 128, 512, 1024)


def _measure_rtt_floor():
    """Dispatch+fetch floor of a trivial one-op program: the tunnel/PJRT
    round trip every timed window below also contains exactly once."""
    one = jax.jit(lambda x: x + 1.0)
    x = jnp.asarray(0.0, jnp.float32)
    float(one(x))  # compile
    ts = []
    for i in range(ITERS):
        x = jnp.asarray(float(i), jnp.float32)
        float(x + 0.0)  # materialize input outside the window
        t0 = time.perf_counter()
        float(one(x))
        ts.append(time.perf_counter() - t0)
    return min(ts), float(np.median(ts))


def main(batches):
    from biscuit_tpu import serve
    from biscuit_tpu.hp import nature2022_params
    from biscuit_tpu.models.xception import build_model
    from biscuit_tpu.train.trainer import init_model, save_checkpoint

    print(f"backend={jax.default_backend()}", flush=True)
    hp = nature2022_params()
    model = build_model(hp)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params, batch_stats = init_model(model, hp, jax.random.PRNGKey(0))

    rtt_min, rtt_med = _measure_rtt_floor()
    print(f"tunnel RTT floor: min {rtt_min*1e3:.1f} ms / "
          f"median {rtt_med*1e3:.1f} ms (subtract for co-located estimate)",
          flush=True)

    sum_u8 = jax.jit(lambda x: jnp.sum(x, dtype=jnp.float32))
    rows = []
    with tempfile.TemporaryDirectory() as tmp:
        sub = save_checkpoint(tmp, params, batch_stats, hp, epoch=1,
                              outcome="cohort", label="bench", kfold=None)
        for b in batches:
            path = serve.export_servable(
                sub, batch_size=b,
                out_path=f"{tmp}/servable_b{b}.biscuit")
            size_mb = os.path.getsize(path) / 1e6
            # Cold load: container parse + checksum verify +
            # jax.export.deserialize of every program.
            t0 = time.perf_counter()
            sv = serve.load_servable(path)
            t_load = time.perf_counter() - t0
            gen = jax.jit(lambda k, b=b: jax.random.randint(
                k, (b, hp.tile_px, hp.tile_px, 3), 0, 256, dtype=jnp.uint8))
            keys = [jax.random.PRNGKey(1000 * b + i)
                    for i in range(ITERS + 1)]
            # First dispatch = XLA compile of the deserialized StableHLO +
            # weight upload + one execute (remote: ~20-60s on a cold
            # persistent cache; the number below is the warm-cache cold
            # start a restarting serving process pays).
            xw = gen(keys[-1])
            float(sum_u8(xw))
            t0 = time.perf_counter()
            m, s = sv.call_exact(xw, key=keys[-1])
            float(jnp.sum(m) + jnp.sum(s))
            t_first = time.perf_counter() - t0
            print(f"B={b:>5}  artifact {size_mb:7.1f} MB   "
                  f"cold load {t_load*1e3:8.1f} ms   "
                  f"first dispatch {t_first*1e3:8.1f} ms", flush=True)
            del xw, m, s
            ts = []
            for i in range(ITERS):
                x = gen(keys[i])
                float(sum_u8(x))  # input resident before the window opens
                t0 = time.perf_counter()
                m, s = sv.call_exact(x, key=keys[i])
                # Fetch both outputs: the caller's wait ends when results
                # are host-side.
                float(jnp.sum(m) + jnp.sum(s))
                ts.append(time.perf_counter() - t0)
                del x, m, s
            lat_min, lat_med = min(ts), float(np.median(ts))
            rows.append((b, lat_min, lat_med, size_mb, t_load, t_first))
            print(f"B={b:>5}  latency min {lat_min*1e3:8.2f} ms / "
                  f"median {lat_med*1e3:8.2f} ms   "
                  f"(min-RTT {max(lat_min-rtt_min, 0)*1e3:8.2f} ms; "
                  f"{b/lat_min:8.1f} tiles/s single-inflight)", flush=True)

    print("\nB, min_ms, median_ms, minus_rtt_ms, single_inflight_tiles_per_s,"
          " artifact_mb, cold_load_ms, first_dispatch_ms")
    for b, lmin, lmed, size_mb, t_load, t_first in rows:
        print(f"{b}, {lmin*1e3:.2f}, {lmed*1e3:.2f}, "
              f"{max(lmin-rtt_min, 0)*1e3:.2f}, {b/lmin:.1f}, "
              f"{size_mb:.1f}, {t_load*1e3:.1f}, {t_first*1e3:.1f}")


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or list(DEFAULT_BATCHES))
