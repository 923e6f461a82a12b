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


def _rot90_batch(imgs: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Per-image cardinal rotation, k in {0,1,2,3}; static shapes only."""

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


def _gaussian_kernel(sigma: float, radius: int = 3) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur_batch(imgs: jnp.ndarray, sigma_idx: jnp.ndarray,
                apply: jnp.ndarray) -> jnp.ndarray:
    """Separable Gaussian blur with a per-image random sigma, applied with
    probability BLUR_PROB. Depthwise 1-D convs (VPU-friendly)."""
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
    if "x" in augment:
        flip = jax.random.bernoulli(kx, 0.5, (n,))
        imgs = jnp.where(flip[:, None, None, None], imgs[:, :, ::-1], imgs)
    if "y" in augment:
        flip = jax.random.bernoulli(ky, 0.5, (n,))
        imgs = jnp.where(flip[:, None, None, None], imgs[:, ::-1], imgs)
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
