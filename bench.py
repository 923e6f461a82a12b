"""Headline benchmark: MC-dropout tile inferences/sec/chip (K=30, 299px).

This is the driver's metric (BASELINE.json): the reference stack runs K=30
full stochastic TF Xception passes per tile on an A100.

Baseline derivation (the reference publishes no hardware numbers —
SURVEY.md §6): published TF/Keras Xception-299 single-pass inference
throughput on A100 is ~1.5-2k img/s (fp16/XLA, batch>=64; consistent with
MLPerf-era Keras benchmarks and the TF model-zoo). slideflow's UQ path
(slideflow/model/tensorflow: uq_mean per batch) executes K=30 independent
full stochastic passes per tile: the shipped stack simply calls the whole
model K times with training=True and has no trunk-caching path, so every
pass pays the full network cost regardless of where the dropout layers
sit. (This repo's uq.py exploits the published model's head-only dropout
to run the trunk once — an optimization the baseline stack does not
have.) 1.8k/30 = **60 tiles/s/GPU** is the A100-TF baseline constant.

Measured here, on one TPU chip:
  1. headline (device-resident): uint8 tiles already in HBM -> reinhard-fast
     stain norm -> per-image standardization -> bf16 Xception trunk (fused
     Pallas middle flow) -> fused Pallas K=30 MC-dropout head with on-chip
     softmax mean/std. Distinct pre-staged batches per timed iteration
     (same-args-repeated timing can flatter; see CLAUDE.md).
  2. e2e (tile stream): tfrecord JPEG tiles decoded on host (native C++
     loader) -> PrefetchBatcher -> device_put -> same UQ step. This is the
     "decode -> normalize -> K=30 passes" loop of the north star; on this
     1-core host it is host-decode-bound and reported as a companion
     number, not the headline.
  3. MFU: headline throughput x analytic FLOPs/tile (models/flops.py)
     over the chip's bf16 peak.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

A100_TF_BASELINE_TILES_PER_S = 60.0
# batch sweep (r1): 256->3014, 512->3124, 1024->3209; (r2, fused
# preprocess+middle): 1024->4083; 2048 OOMs HBM (entry-flow activations).
BATCH = int(os.environ.get("BISCUIT_BENCH_BATCH", "1024"))
WARMUP = 2
ITERS = 6
E2E_BATCHES = 8
E2E_REPEATS = int(os.environ.get("BISCUIT_BENCH_E2E_REPEATS", "3"))
E2E_CORPUS_SLIDES = 4
E2E_TILES_PER_SLIDE = 256


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_uq_step(jax, jnp, corpus_paths=None):
    from biscuit_tpu.data.normalize import (
        inference_preprocess,
        make_normalizer,
    )
    from biscuit_tpu.hp import nature2022_params
    from biscuit_tpu.models.xception import build_model
    from biscuit_tpu.train.uq import mc_dropout_predict

    hp = nature2022_params()
    hp.uq = True
    model = build_model(hp)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((2, hp.tile_px, hp.tile_px, 3), jnp.float32)
    # Initialize on host CPU (compiling the init program through the remote
    # TPU tunnel takes ~2 min; weights transfer in seconds).
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(
            {"params": rng, "dropout": rng}, dummy, train=False
        )
    device = jax.devices()[0]
    variables = jax.device_put(variables, device)
    params, batch_stats = variables["params"], variables["batch_stats"]
    normalizer = make_normalizer(hp.normalizer)

    # Opt-in w8a8 trunk (ops/int8_trunk.py; measured on chip r4 and
    # acquitted as a throughput lever — e2e neutral vs bf16, table in the
    # module STATUS — so the headline stays bf16; kept for
    # weight-memory-constrained serving).
    qw = None
    if os.environ.get("BISCUIT_BENCH_INT8") == "1":
        from biscuit_tpu.ops.int8_trunk import (
            calibrate_int8_trunk,
            prepare_int8_trunk,
        )

        # Calibrate on decoded JPEG tiles from the e2e corpus, not noise:
        # activation ranges from uniform-random pixels are not ranges from
        # tiles (stain-normalized tissue-like content has a much narrower
        # post-preprocess distribution).
        _log("int8: calibrating the w8a8 trunk on decoded corpus tiles...")
        calib_u8 = jnp.asarray(_corpus_tiles(corpus_paths, 256, hp.tile_px))
        calib = inference_preprocess(jax.device_put(calib_u8, device),
                                     normalizer)
        scales = calibrate_int8_trunk(model, params, batch_stats, calib)
        qw = prepare_int8_trunk(model, params, batch_stats, scales)
        qw = jax.device_put(qw, device)

    @jax.jit
    def uq_step(params, batch_stats, images_u8, key):
        x = inference_preprocess(images_u8, normalizer)
        return mc_dropout_predict(
            model, params, batch_stats, x, key, k=30, int8_qw=qw
        )

    return hp, params, batch_stats, uq_step, device


def bench_device_resident(jax, jnp, params, batch_stats, uq_step):
    gen = np.random.default_rng(0)
    # Distinct device-resident batches, cycled across timed iterations.
    batches = [
        jnp.asarray(gen.integers(0, 255, (BATCH, 299, 299, 3),
                                 dtype=np.uint8))
        for _ in range(min(ITERS, 3))
    ]
    keys = jax.random.split(jax.random.PRNGKey(1), WARMUP + ITERS)

    for i in range(WARMUP):
        mean, std = uq_step(params, batch_stats, batches[0], keys[i])
    jax.block_until_ready((mean, std))

    # Timed: dispatch all iterations asynchronously, sync once (amortizes
    # host->device tunnel latency; measures sustained device throughput).
    t0 = time.perf_counter()
    outs = []
    for i in range(ITERS):
        outs.append(uq_step(params, batch_stats, batches[i % len(batches)],
                            keys[WARMUP + i]))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    return BATCH * ITERS / dt


def _make_corpus(root, tile_px=299):
    """Synthetic JPEG-tile tfrecord corpus (the on-disk format the real
    pipeline consumes; data/tfrecord.py framing + index sidecars)."""
    import io

    from PIL import Image

    from biscuit_tpu.data.tfrecord import TFRecordWriter

    gen = np.random.default_rng(0)
    paths = []
    for s in range(E2E_CORPUS_SLIDES):
        path = os.path.join(root, f"bench{s}.tfrecords")
        with TFRecordWriter(path) as w:
            for t in range(E2E_TILES_PER_SLIDE):
                # Low-frequency content + noise: realistic JPEG decode cost.
                base = gen.integers(80, 200, (8, 8, 3), dtype=np.uint8)
                img = np.asarray(
                    Image.fromarray(base).resize((tile_px, tile_px))
                )
                img = np.clip(
                    img.astype(np.int16)
                    + gen.integers(-20, 20, img.shape, dtype=np.int16),
                    0, 255,
                ).astype(np.uint8)
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, format="JPEG", quality=85)
                w.write_tile(f"bench{s}", buf.getvalue(), loc_x=t, loc_y=0)
        paths.append(path)
    return paths


def _corpus_tiles(paths, n, tile_px):
    """Decode n tiles from the JPEG corpus (host, native loader) as a
    uint8 [n, tile_px, tile_px, 3] array — the int8 calibration set."""
    from biscuit_tpu.data.pipeline import TileBatcher

    batcher = TileBatcher(paths, labels=None, batch_size=n, shuffle=True,
                          infinite=True, seed=7, tile_px=tile_px)
    try:
        return np.asarray(next(iter(batcher))["image"][:n])
    finally:
        batcher.close()


def bench_e2e(jax, jnp, params, batch_stats, uq_step, device, paths):
    from biscuit_tpu.data.pipeline import PrefetchBatcher, TileBatcher

    batcher = TileBatcher(
        paths, labels=None, batch_size=BATCH // 4, shuffle=True,
        infinite=True, seed=0, tile_px=299,
    )
    prefetch = PrefetchBatcher(batcher, depth=4)
    try:
        it = iter(prefetch)
        keys = jax.random.split(jax.random.PRNGKey(2), E2E_BATCHES + 1)
        # Warm the pipeline + reuse the compiled (BATCH//4) program.
        b = next(it)
        out = uq_step(params, batch_stats,
                      jax.device_put(b["image"], device), keys[-1])
        jax.block_until_ready(out)

        # Double-buffered stream: upload batch i+1 while the device
        # computes batch i (device_put enqueues an async copy; the
        # r3 loop serialized a synchronous 34 MB tunnel upload against
        # every dispatch, which is where its 4x e2e swing lived).
        # Per-phase wall buckets (decode wait / device_put call /
        # dispatch+sync) are reported for attribution — buckets
        # overlap device work, so they sum to ~dt, not to device time.
        # NOTE on bucket shape: because the upload is async, its wait
        # surfaces at the dispatch fence — dispatch+sync, not
        # device_put, carries the tunnel-upload cost in this loop.
        # The metric swings ~3x on tunnel weather (r2 199 / r3 47 /
        # r4 56-188 tiles/s same-day), so the protocol runs
        # E2E_REPEATS independent repeats and reports the median
        # (stable central figure) and best (tunnel-least-bound bound),
        # with every repeat's buckets embedded in the JSON.
        repeats = []
        for r in range(E2E_REPEATS):
            t_decode = t_put = 0.0
            n = 0
            t0 = time.perf_counter()
            b = next(it)
            images = jax.device_put(b["image"], device)
            n += int(np.asarray(b["mask"]).sum())
            outs = []
            for i in range(E2E_BATCHES):
                outs.append(uq_step(params, batch_stats, images, keys[i]))
                if i + 1 < E2E_BATCHES:
                    t1 = time.perf_counter()
                    b = next(it)
                    t2 = time.perf_counter()
                    images = jax.device_put(b["image"], device)
                    t3 = time.perf_counter()
                    t_decode += t2 - t1
                    t_put += t3 - t2
                    n += int(np.asarray(b["mask"]).sum())
            jax.block_until_ready(outs)
            dt = time.perf_counter() - t0
            rep = {
                "tiles_per_s": round(n / dt, 2),
                "wall_s": round(dt, 2),
                "decode_wait_s": round(t_decode, 2),
                "device_put_s": round(t_put, 2),
                "dispatch_sync_s": round(dt - t_decode - t_put, 2),
            }
            repeats.append(rep)
            _log(f"e2e repeat {r + 1}/{E2E_REPEATS}: "
                 f"{rep['tiles_per_s']} tiles/s over {rep['wall_s']}s "
                 f"(decode-wait {rep['decode_wait_s']}s, device_put "
                 f"{rep['device_put_s']}s, dispatch+sync "
                 f"{rep['dispatch_sync_s']}s)")

    finally:
        # Stop the decode worker before the tempdir is torn down.
        prefetch.close()
        batcher.close()

    # Companion: host decode-only throughput (no device) — separates
    # the host pipeline's capability from the dev tunnel's
    # host->device transfer, which dominates e2e here. A FRESH
    # non-prefetched batcher: draining the prefetch queue filled
    # during the device phase would overstate decode rate.
    host_batcher = TileBatcher(
        paths, labels=None, batch_size=BATCH // 4, shuffle=True,
        infinite=True, seed=1, tile_px=299,
    )
    try:
        import resource

        hit = iter(host_batcher)
        next(hit)  # warm file handles/indices
        n_host = 0
        ru0 = resource.getrusage(resource.RUSAGE_SELF)
        t0 = time.perf_counter()
        for i in range(E2E_BATCHES):
            n_host += int(np.asarray(next(hit)["mask"]).sum())
        host_dt = time.perf_counter() - t0
        ru1 = resource.getrusage(resource.RUSAGE_SELF)
        host_cpu = (ru1.ru_utime + ru1.ru_stime
                    - ru0.ru_utime - ru0.ru_stime)
    finally:
        host_batcher.close()
    # CPU-seconds/tile is the machine-independent decode cost; the
    # projection assumes linear thread scaling (measured flat at 1 core,
    # benchmarks/bench_host_decode.py) on a co-located multi-core VM.
    cpu_us_per_tile = host_cpu / max(n_host, 1) * 1e6
    projected_8core = 8e6 / cpu_us_per_tile if cpu_us_per_tile else None
    rates = sorted(r["tiles_per_s"] for r in repeats)
    median = rates[len(rates) // 2] if len(rates) % 2 else (
        (rates[len(rates) // 2 - 1] + rates[len(rates) // 2]) / 2)
    return (median, rates[-1], repeats, n_host / host_dt,
            cpu_us_per_tile, projected_8core)


def main():
    import jax
    import jax.numpy as jnp

    from biscuit_tpu.models.flops import peak_flops, uq_flops_per_tile

    with tempfile.TemporaryDirectory() as tmp:
        # The JPEG corpus is load-bearing only for int8 calibration
        # (BISCUIT_BENCH_INT8=1); in the default configuration it feeds
        # just the e2e companion, so build it inside the companion's
        # guard — a corpus failure must not sink the headline.
        corpus_paths = None
        if os.environ.get("BISCUIT_BENCH_INT8") == "1":
            _log("building JPEG tfrecord corpus (int8 calibration)...")
            corpus_paths = _make_corpus(tmp)

        _hp, params, batch_stats, uq_step, device = build_uq_step(
            jax, jnp, corpus_paths=corpus_paths)

        _log("headline: device-resident UQ throughput...")
        tiles_per_s = bench_device_resident(jax, jnp, params, batch_stats,
                                            uq_step)

        _log("companion: prefetch-fed end-to-end tile stream...")
        try:
            if corpus_paths is None:
                _log("building JPEG tfrecord corpus (e2e stream)...")
                corpus_paths = _make_corpus(tmp)
            (e2e_tiles_per_s, e2e_best, e2e_repeats, host_tiles_per_s,
             host_cpu_us, host_proj_8core) = bench_e2e(
                jax, jnp, params, batch_stats, uq_step, device,
                corpus_paths)
        except Exception as e:  # companion metric must not sink the headline
            _log(f"e2e bench failed: {e!r}")
            e2e_tiles_per_s = e2e_best = host_tiles_per_s = None
            e2e_repeats = None
            host_cpu_us = host_proj_8core = None

    fpt = uq_flops_per_tile("xception", tile_px=299, k=30)
    peak = peak_flops(device.device_kind)
    mfu = tiles_per_s * fpt / peak
    int8_mode = os.environ.get("BISCUIT_BENCH_INT8") == "1"
    int8_middle = int8_mode and os.environ.get("BISCUIT_INT8_MIDDLE") == "1"
    trunk_desc = (
        "w8a8 int8 Xception incl. middle flow (bf16 depthwise)"
        if int8_middle else
        "w8a8 int8 Xception (bf16 depthwise/middle)" if int8_mode
        else "bf16 Xception w/ fused middle flow")

    print(
        json.dumps(
            {
                "metric": "mc_dropout_tile_inferences_per_sec_per_chip",
                "value": round(tiles_per_s, 2),
                "unit": "tiles/s (K=30, 299px, fused Pallas preprocess + "
                        f"{trunk_desc} + fused MC-dropout head)",
                "trunk": ("w8a8+middle" if int8_middle
                          else "w8a8" if int8_mode else "bf16"),
                "vs_baseline": round(
                    tiles_per_s / A100_TF_BASELINE_TILES_PER_S, 2
                ),
                "e2e_tiles_per_s": (
                    round(e2e_tiles_per_s, 2)
                    if e2e_tiles_per_s is not None else None
                ),
                "e2e_tiles_per_s_best": (
                    round(e2e_best, 2) if e2e_best is not None else None
                ),
                "e2e_protocol": (
                    f"median of {E2E_REPEATS} repeats x {E2E_BATCHES} "
                    "double-buffered batches; tunnel-upload wait lands in "
                    "dispatch_sync_s (async device_put)"
                ),
                "e2e_repeats": e2e_repeats,
                "host_decode_tiles_per_s": (
                    round(host_tiles_per_s, 2)
                    if host_tiles_per_s is not None else None
                ),
                "host_decode_cpu_us_per_tile": (
                    round(host_cpu_us, 1)
                    if host_cpu_us is not None else None
                ),
                "host_projected_8core_tiles_per_s": (
                    round(host_proj_8core, 0)
                    if host_proj_8core is not None else None
                ),
                "mfu_pct": round(100 * mfu, 1),
                "flops_per_tile": fpt,
                "device_kind": device.device_kind,
            }
        )
    )


if __name__ == "__main__":
    main()
