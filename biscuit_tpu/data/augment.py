"""Tile augmentation: the published 'xyrjb' policy as a jittable batch op.

The reference's hyperparameters request augment='xyrjb'
(/root/reference/biscuit/hp.py:24), executed by slideflow's tf.data
pipeline: x = random horizontal flip, y = random vertical flip, r = random
cardinal (90-degree) rotation, j = random JPEG re-compression, b = random
Gaussian blur.

TPU-first redesign: flips/rotations/blur run on-chip, vectorized over the
batch with per-image randomness from a single threaded PRNG key — they fuse
with the stain normalizer into one XLA program. JPEG re-compression is a
codec operation; it runs host-side in the input pipeline
(:func:`jpeg_augment_host`) exactly as slideflow does it on CPU, with the
same 50-100 quality range and application probability.

Deliberate ordering deviation (SURVEY.md §2.2 convention; VERDICT r2
weak-5): the train step standardizes (stain-normalize +
per-image-standardize) *then* augments (train/trainer.py make_train_step),
whereas slideflow's tf.data pipeline augments in image space *before*
standardization. The orders commute up to float rounding for every
on-chip op in the policy:

* flips and cardinal rotations are pixel permutations — they commute with
  any per-pixel map and with per-image statistics exactly;
* Gaussian blur has a normalized kernel (sum 1), so in the image
  interior it commutes with the affine per-image standardization
  (blur(ax+b) = a*blur(x)+b wherever the kernel has full support). Two
  residual deviations remain, both accepted: (a) in the <=3-pixel
  boundary band the SAME zero padding breaks the additive part — padding
  pulls standardized tiles toward the image mean where slideflow's
  image-space blur pulls toward black; (b) blur does not commute with
  Reinhard stain normalization (a nonlinear LAB-space map). Both are
  blur-rate (10%) second-order effects on training augmentation noise,
  tested in tests/test_data_plane.py::test_blur_standardize_commute;
* JPEG augmentation runs host-side on the raw uint8 tile before either
  path's normalization, identical to slideflow.
"""

from __future__ import annotations

import io
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BLUR_PROB = 0.1
BLUR_SIGMAS = (0.5, 1.0, 1.5, 2.0)
JPEG_PROB = 0.5
JPEG_QUALITY_RANGE = (50, 100)


def _rot90_batch_switch(imgs: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Per-image cardinal rotation via vmapped lax.switch (the original
    formulation; vmapped control flow computes ALL four branches and
    selects — kept as the non-square fallback and bench baseline)."""

    def rot_one(img, kk):
        return jax.lax.switch(
            kk,
            [
                lambda x: x,
                lambda x: jnp.rot90(x, 1),
                lambda x: jnp.rot90(x, 2),
                lambda x: jnp.rot90(x, 3),
            ],
            img,
        )

    return jax.vmap(rot_one)(imgs, k)


def _rot90_batch(imgs: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Per-image cardinal rotation, k in {0,1,2,3}; static shapes only.

    Square images (the tile pipeline's case) use the transpose+flip
    decomposition — one transpose and two masked flips instead of the
    vmapped 4-branch switch (which materializes every rotation):
    rot90^1 = flipud . T, rot90^2 = flipud . fliplr, rot90^3 = fliplr . T.
    Bitwise-identical to jnp.rot90 (pure index permutations); pinned by
    tests/test_data_plane.py.

    Tiles are always square; odd rotations of a rectangle change its
    shape, so (like the switch formulation, whose branches would have
    mismatched types) this requires H == W — now an explicit error.
    """
    if imgs.shape[1] != imgs.shape[2]:
        raise ValueError(
            f"cardinal rotation augmentation needs square tiles, got "
            f"{imgs.shape[1]}x{imgs.shape[2]}")
    odd = (k % 2 == 1)[:, None, None, None]
    x = jnp.where(odd, jnp.transpose(imgs, (0, 2, 1, 3)), imgs)
    fud = ((k == 1) | (k == 2))[:, None, None, None]
    x = jnp.where(fud, x[:, ::-1], x)
    flr = ((k == 2) | (k == 3))[:, None, None, None]
    return jnp.where(flr, x[:, :, ::-1], x)


def _gaussian_kernel(sigma: float, radius: int = 3) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _dihedral_batch(imgs: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray,
                    k: jnp.ndarray) -> jnp.ndarray:
    """Per-image composition rot90^k . flip_y^fy . flip_x^fx in ONE
    dihedral-group application: a masked transpose and two masked flips
    (3 passes) instead of two flip passes + a rotation. The (t, u, l)
    canonical decomposition (transpose, then flip axis0, then flip
    axis1) was derived by enumerating all 16 (fx, fy, k) combos; parity
    is pinned bitwise in tests/test_data_plane.py."""
    odd = k % 2 == 1
    t = odd
    u = ((k == 1) | (k == 2)) ^ (fy & ~odd) ^ (fx & odd)
    lf = ((k == 2) | (k == 3)) ^ (fx & ~odd) ^ (fy & odd)
    x = jnp.where(t[:, None, None, None],
                  jnp.transpose(imgs, (0, 2, 1, 3)), imgs)
    x = jnp.where(u[:, None, None, None], x[:, ::-1], x)
    return jnp.where(lf[:, None, None, None], x[:, :, ::-1], x)


def _blur_batch(imgs: jnp.ndarray, sigma_idx: jnp.ndarray,
                apply: jnp.ndarray) -> jnp.ndarray:
    """Separable blur via vmapped per-image conv pairs — measured FASTER
    than static shifted-slice FMAs on v5e (the W shifts ride the sublane
    dim and relayout; benchmarks/bench_augment.py record)."""
    kernels = jnp.asarray(
        np.stack([_gaussian_kernel(s) for s in BLUR_SIGMAS]), jnp.float32
    )

    n, h, w, c = imgs.shape
    ktap = kernels.shape[1]

    def blur_one(img, kidx):
        k = kernels[kidx]
        # horizontal then vertical 1-D convolution per channel
        x = jnp.moveaxis(img, -1, 0)[:, None]  # (C,1,H,W)
        kh = k.reshape(1, 1, 1, ktap)
        kv = k.reshape(1, 1, ktap, 1)
        x = jax.lax.conv_general_dilated(x, kh, (1, 1), "SAME")
        x = jax.lax.conv_general_dilated(x, kv, (1, 1), "SAME")
        return jnp.moveaxis(x[:, 0], 0, -1)

    blurred = jax.vmap(blur_one)(imgs, sigma_idx)
    return jnp.where(apply[:, None, None, None], blurred, imgs)


def _blur_batch_shift(imgs: jnp.ndarray, sigma_idx: jnp.ndarray,
                      apply: jnp.ndarray) -> jnp.ndarray:
    """Static shifted-slice FMA blur — measured SLOWER than the vmapped
    conv on v5e (W shifts are cross-sublane relayouts); kept as the
    bench baseline and parity witness."""
    kernels = jnp.asarray(
        np.stack([_gaussian_kernel(s) for s in BLUR_SIGMAS]), jnp.float32
    )
    taps = kernels[sigma_idx]  # (N, T) per-image kernel
    ktap = kernels.shape[1]
    rad = ktap // 2
    n, h, w, c = imgs.shape

    xp = jnp.pad(imgs, ((0, 0), (0, 0), (rad, rad), (0, 0)))
    y = sum(xp[:, :, t:t + w, :] * taps[:, t][:, None, None, None]
            for t in range(ktap))
    yp = jnp.pad(y, ((0, 0), (rad, rad), (0, 0), (0, 0)))
    z = sum(yp[:, t:t + h, :, :] * taps[:, t][:, None, None, None]
            for t in range(ktap))
    return jnp.where(apply[:, None, None, None], z, imgs)


@partial(jax.jit, static_argnames=("augment",))
def augment_batch(imgs: jnp.ndarray, key: jax.Array,
                  augment: str = "xyrjb") -> jnp.ndarray:
    """Apply the on-chip portion of the augmentation policy to a batch.

    Args:
        imgs: (N, H, W, C) float32.
        key: PRNG key (threaded, never reused by the caller).
        augment: policy string; 'x','y','r','b' are applied here, 'j' is a
            host-side codec op (see jpeg_augment_host).
    """
    n = imgs.shape[0]
    kx, ky, kr, kb1, kb2 = jax.random.split(key, 5)
    square = imgs.shape[1] == imgs.shape[2]
    if "x" in augment and "y" in augment and "r" in augment and square:
        # Published 'xyrjb' fast path: the three permutations collapse to
        # one dihedral-group application (same PRNG draws, same result —
        # pinned bitwise in tests/test_data_plane.py).
        fx = jax.random.bernoulli(kx, 0.5, (n,))
        fy = jax.random.bernoulli(ky, 0.5, (n,))
        k = jax.random.randint(kr, (n,), 0, 4)
        imgs = _dihedral_batch(imgs, fx, fy, k)
    else:
        if "x" in augment:
            flip = jax.random.bernoulli(kx, 0.5, (n,))
            imgs = jnp.where(flip[:, None, None, None], imgs[:, :, ::-1],
                             imgs)
        if "y" in augment:
            flip = jax.random.bernoulli(ky, 0.5, (n,))
            imgs = jnp.where(flip[:, None, None, None], imgs[:, ::-1],
                             imgs)
        if "r" in augment:
            k = jax.random.randint(kr, (n,), 0, 4)
            imgs = _rot90_batch(imgs, k)
    if "b" in augment:
        apply = jax.random.bernoulli(kb1, BLUR_PROB, (n,))
        sigma_idx = jax.random.randint(kb2, (n,), 0, len(BLUR_SIGMAS))
        imgs = _blur_batch(imgs, sigma_idx, apply)
    return imgs


def jpeg_augment_host(png_or_array, rng: np.random.Generator):
    """Host-side random JPEG re-compression (the 'j' in 'xyrjb').

    Takes a HWC uint8 array, returns a HWC uint8 array. Applied with
    probability JPEG_PROB at quality U(50, 100), like the TF pipeline's
    tf.image.adjust_jpeg_quality path.
    """
    if rng.random() >= JPEG_PROB:
        return png_or_array
    from PIL import Image

    quality = int(rng.integers(*JPEG_QUALITY_RANGE))
    img = Image.fromarray(png_or_array)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=quality)
    buf.seek(0)
    return np.asarray(Image.open(buf).convert("RGB"))
