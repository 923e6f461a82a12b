"""On-chip augmentation attribution + variant shootout (train-step lever).

bench_train_step.py buckets augment at 6.5 ms of the 139.9 ms published
train step (B=128, 'xyrjb'). The on-chip ops are x/y flips, cardinal
rotation, and Gaussian blur (data/augment.py); this bench times each
stage alone and the composition, plus reformulations:

  rot_switch   vmap(lax.switch(rot90 x4))          [baseline]
  rot_tf       transpose + masked flips (k&1 transpose, then flips)
  dihedral     flips + rotation collapsed to one masked T/U/L triple
  blur_vmapc   vmap over per-image conv pairs       [winner]
  blur_shift   static 7-tap shifted FMAs with per-image gathered taps

Chained in-jit timing with data dependence (CLAUDE.md: independent
dispatches lie through the tunnel).

Measured (v5e, B=128 299x299x3 f32, r3, iters=20, chained):

    flips x+y    2.37 ms   (2 masked reverses; W reverse relayouts)
    rot_switch   3.65 ms   rot_tf    2.86 ms   dihedral  1.53 ms
    blur_vmapc   1.95 ms   blur_shift 3.52 ms  (sublane shifts lose)
    full xyrb    4.46 ms   (was ~6.5 in the train-step bucket profile)

-> augment_batch's 'xyr' collapses to ONE dihedral application (~4x on
   the permutation stage); blur keeps the vmapped conv. Net ~2 ms off
   the 139.9 ms published train step. Parity pinned bitwise
   (tests/test_data_plane.py: dihedral == sequential for all 16 combos).

Run: python benchmarks/bench_augment.py [batch]
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

    from biscuit_tpu.data import augment as aug

    print(f"device={jax.devices()[0].device_kind} batch={batch}")
    rng = np.random.default_rng(0)
    x0 = jax.device_put(
        rng.standard_normal((batch, 299, 299, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    def chain_time(fn, x0, iters=20):
        @jax.jit
        def chain(x, n):
            def body(i, carry):
                x, k = carry
                k, sub = jax.random.split(k)
                out = fn(x, sub)
                return out.astype(x.dtype), k

            y, _ = jax.lax.fori_loop(0, n, body, (x, key))
            return y

        jax.block_until_ready(chain(x0, 1))
        t0 = time.perf_counter()
        jax.block_until_ready(chain(x0, 1))
        a = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(chain(x0, iters))
        b = time.perf_counter() - t0
        return (b - a) / (iters - 1) * 1e3

    n = batch

    def flips(x, k):
        kx, ky = jax.random.split(k)
        f = jax.random.bernoulli(kx, 0.5, (n,))
        x = jnp.where(f[:, None, None, None], x[:, :, ::-1], x)
        f = jax.random.bernoulli(ky, 0.5, (n,))
        return jnp.where(f[:, None, None, None], x[:, ::-1], x)

    def rot_switch(x, k):
        kk = jax.random.randint(k, (n,), 0, 4)
        return aug._rot90_batch_switch(x, kk)

    def rot_tf(x, k):
        kk = jax.random.randint(k, (n,), 0, 4)
        return aug._rot90_batch(x, kk)

    def blur_vmapc(x, k):
        k1, k2 = jax.random.split(k)
        apply = jax.random.bernoulli(k1, aug.BLUR_PROB, (n,))
        sidx = jax.random.randint(k2, (n,), 0, len(aug.BLUR_SIGMAS))
        return aug._blur_batch(x, sidx, apply)

    def blur_shift(x, k):
        k1, k2 = jax.random.split(k)
        apply = jax.random.bernoulli(k1, aug.BLUR_PROB, (n,))
        sidx = jax.random.randint(k2, (n,), 0, len(aug.BLUR_SIGMAS))
        return aug._blur_batch_shift(x, sidx, apply)

    def dihedral(x, k):
        k1, k2, k3 = jax.random.split(k, 3)
        fx = jax.random.bernoulli(k1, 0.5, (n,))
        fy = jax.random.bernoulli(k2, 0.5, (n,))
        kk = jax.random.randint(k3, (n,), 0, 4)
        return aug._dihedral_batch(x, fx, fy, kk)

    def full(x, k):
        return aug.augment_batch(x, k, "xyrb")

    for name, fn in [("flips x+y", flips), ("rot_switch", rot_switch),
                     ("rot_tf", rot_tf), ("dihedral", dihedral),
                     ("blur_vmapc", blur_vmapc),
                     ("blur_shift", blur_shift), ("full xyrb", full)]:
        t = chain_time(fn, x0)
        print(f"{name:11s} {t:6.2f} ms")


if __name__ == "__main__":
    main()
