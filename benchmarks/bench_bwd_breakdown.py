"""Backward-pass breakdown of the published train step (B=128, v5e).

The step profile (bench_train_step.py) shows bwd+update at 96 ms of
139.9 — the only remaining big lever. This decomposes the backward by
training with gradients STOPPED at stage boundaries (entry | middle |
exit+head): the delta between successive variants is that stage's
backward cost (dgrad through it + wgrad of its params). BatchNorm
batch_stats stay mutable in every stage so the forward is identical
across variants; only the differentiated set changes.

Chained in-jit timing (CLAUDE.md: independent dispatch timings lie).

Measured (v5e, B=128, r3):
    fwd+bwd(exit+head)   43.1 ms/iter
    fwd+bwd(middle..)    71.8 ms/iter
    fwd+bwd(all)        135.3 ms/iter
    -> middle-flow backward 28.7 ms, ENTRY-FLOW BACKWARD 63.5 ms,
       exit+head backward ~10 ms (43.1 - fwd 32.7).
The entry flow owns two-thirds of the backward at ~4-5x its own forward
cost — see bench_bwd_ops.py for the per-op attribution.

Run: python benchmarks/bench_bwd_breakdown.py [batch]
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
    import optax

    from biscuit_tpu.data.normalize import make_normalizer
    from biscuit_tpu.hp import nature2022
    from biscuit_tpu.models.xception import build_model
    from biscuit_tpu.train import trainer

    hp = nature2022.copy()
    hp.batch_size = batch
    model = build_model(hp)
    normalizer = make_normalizer(hp.normalizer)
    params, batch_stats = trainer.init_model(model, hp, jax.random.PRNGKey(0))
    print(f"device={jax.devices()[0].device_kind} batch={batch}")

    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.integers(0, 255, (batch, 299, 299, 3), dtype=np.uint8))
    labels = jax.device_put(rng.integers(0, 2, (batch,)).astype(np.int32))
    params = jax.device_put(params)
    batch_stats = jax.device_put(batch_stats)

    def staged_loss(p, x, drop_key, stop_seam):
        """Forward via the trunk stage methods with a stop_gradient at ONE
        stage seam. stop_seam: 'entry|middle' (bwd covers middle+exit+head),
        'middle|exit' (bwd covers exit+head), or None (full bwd)."""
        v = {"params": p, "batch_stats": batch_stats}
        h, _ = model.apply(v, x, train=True, mutable=["batch_stats"],
                           method="trunk_entry")
        if stop_seam == "entry|middle":
            h = jax.lax.stop_gradient(h)
        h, _ = model.apply(v, h, train=True, mutable=["batch_stats"],
                           method="trunk_middle")
        if stop_seam == "middle|exit":
            h = jax.lax.stop_gradient(h)
        feats, _ = model.apply(v, h, train=True, mutable=["batch_stats"],
                               method="trunk_exit")
        logits = model.apply(v, feats, method="head_logits", train=True,
                             rngs={"dropout": drop_key})
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        return ce.mean()

    def make_variant(stop_seam):
        def step(p, x, key):
            xf = trainer.preprocess(x, normalizer)
            loss, grads = jax.value_and_grad(
                lambda pp: staged_loss(pp, xf, key, stop_seam))(p)
            # touch grads so nothing is DCE'd
            gsum = jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(jnp.abs(b)), grads, 0.0)
            return loss + gsum * 1e-12
        return step

    def chain_time(step, iters=5):
        @jax.jit
        def chain(x, n):
            def body(i, carry):
                img, acc = carry
                key = jax.random.fold_in(jax.random.PRNGKey(1), i)
                out = step(params, img, key)
                img = img + (out > 1e30).astype(jnp.uint8)
                return img, acc + out
            _, acc = jax.lax.fori_loop(0, n, body, (x, 0.0))
            return acc
        jax.block_until_ready(chain(images, 1))
        t0 = time.perf_counter()
        jax.block_until_ready(chain(images, 1))
        a = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(chain(images, iters))
        b = time.perf_counter() - t0
        return (b - a) / (iters - 1) * 1e3

    variants = [
        ("fwd+bwd(exit+head)", "middle|exit"),
        ("fwd+bwd(middle..)", "entry|middle"),
        ("fwd+bwd(all)", None),
    ]
    results = {}
    for label, stop in variants:
        results[label] = chain_time(make_variant(stop))
        print(f"{label:22s} {results[label]:8.1f} ms/iter")
    mid_bwd = results["fwd+bwd(middle..)"] - results["fwd+bwd(exit+head)"]
    entry_bwd = results["fwd+bwd(all)"] - results["fwd+bwd(middle..)"]
    print(f"-> middle-flow backward:  {mid_bwd:6.1f} ms")
    print(f"-> entry-flow backward:   {entry_bwd:6.1f} ms")
    print("(exit+head backward is inside the first variant; compare with "
          "bench_train_step.py's forward 32.7 ms and full step 139.9 ms)")


if __name__ == "__main__":
    main()
