"""Tile augmentation: the published 'xyrjb' policy as a jittable batch op.

The reference's hyperparameters request augment='xyrjb'
(/root/reference/biscuit/hp.py:24), executed by slideflow's tf.data
pipeline: x = random horizontal flip, y = random vertical flip, r = random
cardinal (90-degree) rotation, j = random JPEG re-compression, b = random
Gaussian blur.

TPU-first redesign: ALL five policies run on-chip, vectorized over the
batch with per-image randomness from a single threaded PRNG key — they fuse
with the stain normalizer into one XLA program. JPEG re-compression's lossy
core (color convert, 4:2:0 subsample, 8x8 DCT, quantize, IDCT) is linear
algebra, so by default it runs on-chip too (:func:`jpeg_augment_batch`,
DCT as MXU matmuls) on the raw uint8 batch ahead of normalization — the
same point in the math as slideflow's host codec, with the same 50-100
quality range and application probability; parity vs the real codec pinned
in tests/test_jpeg_aug.py. The PIL codec path (:func:`jpeg_augment_host`)
remains under BISCUIT_JPEG_HOST=1; note it also forces the input pipeline
off the native batched decoder (pipeline.py gates on jpeg_aug).

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
* JPEG augmentation defaults to the on-chip DCT round-trip
  (jpeg_augment_device below: DCT-as-kron-matmul, quantize, inverse —
  16 us/tile on chip vs 2.2 ms/tile for the host codec), applied to the
  uint8 tile before normalization like slideflow. BISCUIT_JPEG_HOST=1
  selects the host PIL codec (bitwise libjpeg parity) at the 2.2 ms/tile
  cost; the two paths' training-accuracy equivalence is argued in
  jpeg_augment_device's docstring and tested in tests/test_jpeg_aug.py.
"""

from __future__ import annotations

import io
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BLUR_PROB = 0.1
BLUR_SIGMAS = (0.5, 1.0, 1.5, 2.0)
JPEG_PROB = 0.5
JPEG_QUALITY_RANGE = (50, 100)


def jpeg_on_host() -> bool:
    """True when the 'j' augmentation should run host-side (PIL codec)
    instead of the default on-chip DCT path (BISCUIT_JPEG_HOST=1)."""
    return os.environ.get("BISCUIT_JPEG_HOST", "0") == "1"


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


# -----------------------------------------------------------------------------
# On-chip JPEG re-compression (the default 'j' path)
# -----------------------------------------------------------------------------
# The host codec path above costs a PIL encode+decode per tile AND forces the
# pipeline off the native C++ decoder (pipeline.py gates native batched decode
# on jpeg_aug being false). TPU-first redesign: JPEG's lossy core — RGB→YCbCr,
# 4:2:0 chroma subsampling, 8x8 block DCT, quantization at the IJG
# quality-scaled Annex-K tables, dequantize, IDCT — is pure linear algebra.
# The 2-D 8x8 DCT collapses into ONE (blocks,64)x(64,64) matmul per direction
# (kron(D8,D8) on row-major-flattened blocks), which is exactly MXU-shaped;
# everything else is elementwise. Entropy coding is lossless and therefore
# irrelevant to augmentation.
#
# Deviations from libjpeg (all sub-LSB-scale, bounded by the parity test
# against PIL in tests/test_jpeg_aug.py):
# * float DCT vs libjpeg's integer 'islow' approximation (|err| <= 1 LSB);
# * round-half-to-even quantization vs libjpeg's round-half-away descale;
# * 2x2-mean chroma downsample without libjpeg's alternating +1/+2 bias;
#   upsample uses the same 3/4-1/4 triangular filter as libjpeg's fancy
#   h2v2 upsampler.

_JPEG_LUMA_BASE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], np.float32)  # ITU T.81 Annex K.1

_JPEG_CHROMA_BASE = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], np.float32)  # ITU T.81 Annex K.2


def _dct8_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II rows; D @ block @ D.T gives exactly the
    F(u,v) of T.81 §A.3.3 (so the Annex-K tables apply unscaled)."""
    n = np.arange(8)
    m = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    m[0] *= 1 / np.sqrt(2)
    return (0.5 * m).astype(np.float32)


def _jpeg_plane(plane: jnp.ndarray, tbl: jnp.ndarray) -> jnp.ndarray:
    """Quantize one (N,H,W) sample plane through 8x8 DCT blocks.

    tbl is (N, 64): the per-image quality-scaled quantization table.
    H and W must be multiples of 8. The two 2-D DCTs run as (blocks,64) @
    (64,64) matmuls (kron of the 1-D basis with itself) at
    Precision.HIGHEST — quality-99 DC coefficients reach ~1e3 where bf16
    MXU passes would lose whole sample levels.
    """
    d8 = _dct8_matrix()
    k64 = jnp.asarray(np.kron(d8, d8))
    n, h, w = plane.shape
    hi = jax.lax.Precision.HIGHEST
    b = (plane - 128.0).reshape(n, h // 8, 8, w // 8, 8)
    b = b.transpose(0, 1, 3, 2, 4).reshape(n, -1, 64)
    coef = jnp.matmul(b, k64.T, precision=hi)
    deq = jnp.round(coef / tbl[:, None, :]) * tbl[:, None, :]
    out = jnp.matmul(deq, k64, precision=hi)
    out = out.reshape(n, h // 8, w // 8, 8, 8).transpose(0, 1, 3, 2, 4)
    return jnp.clip(jnp.round(out.reshape(n, h, w) + 128.0), 0.0, 255.0)


def _fancy_upsample2(c: jnp.ndarray) -> jnp.ndarray:
    """2x triangular (3/4, 1/4) upsample in H then W — libjpeg's fancy
    h2v2 upsampler (net 2-D weights 9/3/3/1 over the 4 nearest chroma)."""

    def up_rows(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)), mode="edge")
        pairs = jnp.stack(
            [0.25 * xp[:, :-2] + 0.75 * xp[:, 1:-1],
             0.75 * xp[:, 1:-1] + 0.25 * xp[:, 2:]], axis=2)
        return pairs.reshape(x.shape[0], 2 * x.shape[1], x.shape[2])

    c = up_rows(c)
    return up_rows(c.transpose(0, 2, 1)).transpose(0, 2, 1)


@partial(jax.jit, static_argnames=("prob", "quality_range", "subsample"))
def jpeg_augment_batch(
    imgs: jnp.ndarray,
    key: jax.Array,
    prob: float = JPEG_PROB,
    quality_range: tuple = JPEG_QUALITY_RANGE,
    subsample: bool = True,
) -> jnp.ndarray:
    """Random JPEG re-compression of a uint8-valued batch, on-chip.

    Same sampling contract as jpeg_augment_host: each image is re-compressed
    with probability ``prob`` at quality U[quality_range) (integer). Input is
    (N,H,W,3) uint8 or float holding 0-255 values; output has the input's
    dtype with re-compressed rows rounded to integer sample values.
    """
    f = imgs.astype(jnp.float32)
    n, h, w, _ = f.shape
    ka, kq = jax.random.split(key)
    apply = jax.random.bernoulli(ka, prob, (n,))
    q = jax.random.randint(kq, (n,), quality_range[0], quality_range[1])
    # IJG jpeg_quality_scaling + table scaling in int32: both divisions are
    # exact-integer math, which must NOT run through float division on TPU
    # (reciprocal-multiply can floor 600/100 to 5 — CLAUDE.md numerics rule);
    # IJG itself uses integer division for the q<50 branch.
    scale = jnp.where(q < 50, 5000 // q, 200 - 2 * q)[:, None]
    luma = jnp.asarray(_JPEG_LUMA_BASE.reshape(64).astype(np.int32))
    chroma = jnp.asarray(_JPEG_CHROMA_BASE.reshape(64).astype(np.int32))
    tbl_y = jnp.clip((luma * scale + 50) // 100, 1, 255).astype(jnp.float32)
    tbl_c = jnp.clip((chroma * scale + 50) // 100, 1, 255).astype(jnp.float32)

    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = jnp.clip(jnp.round(0.299 * r + 0.587 * g + 0.114 * b), 0.0, 255.0)
    cb = jnp.clip(
        jnp.round(128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b),
        0.0, 255.0)
    cr = jnp.clip(
        jnp.round(128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b),
        0.0, 255.0)

    mcu = 16 if subsample else 8
    ph, pw = -h % mcu, -w % mcu

    def pad(p):
        return jnp.pad(p, ((0, 0), (0, ph), (0, pw)), mode="edge")

    yq = _jpeg_plane(pad(y), tbl_y)[:, :h, :w]
    if subsample:

        def chroma_plane(c):
            cp = pad(c)
            cd = jnp.round(
                cp.reshape(n, (h + ph) // 2, 2, (w + pw) // 2, 2).mean((2, 4))
            )
            return _fancy_upsample2(_jpeg_plane(cd, tbl_c))[:, :h, :w]

        cbq, crq = chroma_plane(cb), chroma_plane(cr)
    else:
        cbq = _jpeg_plane(pad(cb), tbl_c)[:, :h, :w]
        crq = _jpeg_plane(pad(cr), tbl_c)[:, :h, :w]

    cbc, crc = cbq - 128.0, crq - 128.0
    out = jnp.stack(
        [yq + 1.402 * crc,
         yq - 0.344136286 * cbc - 0.714136286 * crc,
         yq + 1.772 * cbc], axis=-1)
    out = jnp.clip(jnp.round(out), 0.0, 255.0)
    out = jnp.where(apply[:, None, None, None], out, f)
    return out.astype(imgs.dtype)
