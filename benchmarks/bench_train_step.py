"""Train-step bucket breakdown at the published config (VERDICT r2 item 4).

Times the B=128 training step's phases on the real chip via serialized
in-jit prefix chains (the only honest timing through the remote tunnel —
CLAUDE.md gotcha: both same-args-repeated and independent-dispatch
timings lie):

  P0  on-chip JPEG augmentation ('j' as DCT matmuls, data/augment.py)
  P1  P0 + preprocess (uint8 -> reinhard_fast -> standardize)
  P2  P1 + augmentation (xyrb on-chip part)
  P3  P2 + forward loss (train-mode Xception + head + CE)
  P4  full step (P3 + backward + optimizer update)

Phase cost = successive prefix deltas. The question the VERDICT poses:
is the preprocess worth fusing into the train step (its input is uint8
DATA, so no VJP is ever needed — gradients cannot flow into it), or is
it <5% of the step (acquittal)?

Run on the chip: python benchmarks/bench_train_step.py [batch]
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
    import optax

    from biscuit_tpu.ops.threshold_device import (
        _enable_persistent_compile_cache,
    )

    _enable_persistent_compile_cache()

    from biscuit_tpu.data.augment import augment_batch, jpeg_augment_batch
    from biscuit_tpu.data.normalize import make_normalizer
    from biscuit_tpu.hp import nature2022
    from biscuit_tpu.models.xception import build_model
    from biscuit_tpu.train import trainer

    hp = nature2022.copy()
    hp.batch_size = batch
    model = build_model(hp)
    normalizer = make_normalizer(hp.normalizer)
    params, batch_stats = trainer.init_model(model, hp, jax.random.PRNGKey(0))
    tx = optax.adam(hp.learning_rate)
    opt_state = tx.init(params)
    print(f"device={jax.devices()[0].device_kind} batch={batch}")

    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.integers(0, 255, (batch, 299, 299, 3), dtype=np.uint8))
    labels = jax.device_put(rng.integers(0, 2, (batch,)).astype(np.int32))
    mask = jax.device_put(np.ones((batch,), np.float32))
    params = jax.device_put(params)
    batch_stats = jax.device_put(batch_stats)
    opt_state = jax.device_put(opt_state)

    def phase(images, key, upto, params, batch_stats, opt_state):
        aug_key, drop_key, jpeg_key = jax.random.split(key, 3)
        raw = jpeg_augment_batch(images, jpeg_key)
        if upto == 0:
            return jnp.sum(raw.astype(jnp.float32)) * 1e-12
        x = trainer.preprocess(raw, normalizer)
        if upto == 1:
            return jnp.sum(x) * 1e-12
        x = augment_batch(x, aug_key, augment=hp.augment)
        if upto == 2:
            return jnp.sum(x) * 1e-12

        def loss_fn(p):
            (logits, updates) = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                rngs={"dropout": drop_key}, mutable=["batch_stats"],
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.maximum(labels, 0))
            return (ce * mask).sum() / mask.sum(), updates["batch_stats"]

        if upto == 3:
            loss, _bs = loss_fn(params)
            return loss * 1e-12
        (loss, _bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, _new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b) * 1e-12, new_params, 0.0) * 1e-12

    names = ["jpeg", "+preprocess", "+augment", "+forward", "full step"]
    prev = 0.0
    print(f"{'prefix':12s} {'ms/iter':>9s} {'delta ms':>9s}")
    for upto in range(5):
        @partial(jax.jit, static_argnames=())
        def chain(images, n, params=params, batch_stats=batch_stats,
                  opt_state=opt_state, upto=upto):
            def body(i, carry):
                img, acc = carry
                key = jax.random.fold_in(jax.random.PRNGKey(1), i)
                out = phase(img, key, upto, params, batch_stats, opt_state)
                # serialize: fold the scalar back into the uint8 input
                img = (img + (out > 1e30).astype(jnp.uint8))
                return img, acc + out
            img, acc = jax.lax.fori_loop(0, n, body, (images, 0.0))
            return acc

        # Timing rules learned from the tunnel runtime (bench_int8_probe
        # methodology): (1) never repeat an exact (program, args) pair —
        # repeated dispatches get memoized and report ~0; (2) never trust
        # block_until_ready on a remote buffer — fetch the VALUE, which
        # cannot exist before the work ran. n is a traced fori_loop bound,
        # so chain(images, n) is ONE program and each distinct n is a
        # fresh args pair; iterations serialize via the img data
        # dependency. per-iter = (t(n2)-t(n1))/(n2-n1) cancels dispatch +
        # fetch overhead.
        float(chain(images, jnp.int32(1)))  # compile + warm
        n1, n2 = 2, 7
        t0 = time.perf_counter()
        float(chain(images, jnp.int32(n1)))
        a = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(images, jnp.int32(n2)))
        b = time.perf_counter() - t0
        per = (b - a) / (n2 - n1) * 1e3
        print(f"{names[upto]:12s} {per:9.1f} {per - prev:9.1f}", flush=True)
        prev = per
    print(f"throughput at full step: {batch / (prev / 1e3):.0f} tiles/s "
          f"(device compute)")


if __name__ == "__main__":
    main()
