"""Headline benchmark: MC-dropout tile inferences/sec/chip (K=30, 299px).

This is the driver's metric (BASELINE.json): the reference stack runs K=30
full stochastic TF Xception passes per tile on an A100; published slideflow
A100 throughput for single-pass Xception-299 inference is ~1.5-2k tiles/s,
so the K=30 UQ loop lands around 50-65 tiles/s/GPU. We take **60 tiles/s**
as the A100-TF baseline (documented estimate; the reference publishes no
hardware numbers — SURVEY.md §6).

The TPU pipeline measured here: uint8 tiles -> reinhard-fast stain norm ->
per-image standardization -> bf16 Xception-299 trunk (once) -> fused Pallas
K=30 MC-dropout head with on-chip softmax mean/std reduction.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

A100_TF_BASELINE_TILES_PER_S = 60.0
BATCH = 1024  # batch sweep: 256->3014, 512->3124, 1024->3209 tiles/s
WARMUP = 2
ITERS = 6


def main():
    import jax
    import jax.numpy as jnp

    from biscuit_tpu.data.normalize import (
        make_normalizer,
        per_image_standardization,
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

    @jax.jit
    def uq_step(params, batch_stats, images_u8, key):
        x = images_u8.astype(jnp.float32)
        x = normalizer(x)
        x = per_image_standardization(x)
        return mc_dropout_predict(
            model, params, batch_stats, x, key, k=30
        )

    gen = np.random.default_rng(0)
    images = jnp.asarray(
        gen.integers(0, 255, (BATCH, 299, 299, 3), dtype=np.uint8)
    )
    keys = jax.random.split(jax.random.PRNGKey(1), WARMUP + ITERS)

    # Warmup (compile + cache).
    for i in range(WARMUP):
        mean, std = uq_step(params, batch_stats, images, keys[i])
    jax.block_until_ready((mean, std))

    # Timed: dispatch all iterations asynchronously, sync once (amortizes
    # host->device tunnel latency; measures sustained device throughput).
    t0 = time.perf_counter()
    outs = []
    for i in range(ITERS):
        outs.append(uq_step(params, batch_stats, images, keys[WARMUP + i]))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    tiles_per_s = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "mc_dropout_tile_inferences_per_sec_per_chip",
                "value": round(tiles_per_s, 2),
                "unit": "tiles/s (K=30, 299px, bf16 Xception + fused "
                        "Pallas MC-dropout head)",
                "vs_baseline": round(
                    tiles_per_s / A100_TF_BASELINE_TILES_PER_S, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
