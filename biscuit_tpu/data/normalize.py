"""Stain normalization and image standardization as vectorized JAX ops.

The reference delegates these to slideflow/TF: the ``reinhard_fast``
normalizer named in the published hyperparameters
(/root/reference/biscuit/hp.py:20) and
``tf.image.per_image_standardization`` applied before inference
(/root/reference/results.py:255). Here both are pure jnp functions that fuse
into the surrounding XLA program — they run on-chip inside the training step
and the MC-dropout inference pipeline, so tiles cross HBM exactly once.

Reinhard-fast = Reinhard color transfer in Ruderman lαβ space *without* the
brightness-standardization step (that is slideflow's 'fast' variant). The
default fit matches slideflow's packaged reference target; ``fit()``
recomputes targets from any RGB tile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# RGB -> LMS (Ruderman et al. 1998, as used by Reinhard et al. 2001).
_RGB2LMS = np.array(
    [
        [0.3811, 0.5783, 0.0402],
        [0.1967, 0.7244, 0.0782],
        [0.0241, 0.1288, 0.8444],
    ],
    np.float32,
)
_LMS2RGB = np.linalg.inv(_RGB2LMS).astype(np.float32)

_B = np.array([[1, 1, 1], [1, 1, -2], [1, -1, 0]], np.float32)
_W = np.diag([1 / np.sqrt(3), 1 / np.sqrt(6), 1 / np.sqrt(2)]).astype(np.float32)
_LOGLMS2LAB = (_W @ _B).astype(np.float32)
_LAB2LOGLMS = np.linalg.inv(_LOGLMS2LAB).astype(np.float32)

# Default target statistics: lαβ means/stds of a canonical synthetic H&E
# tile (eosin-pink cytoplasm + hematoxylin-purple nuclei on white
# background), playing the role of slideflow's packaged reference image.
DEFAULT_TARGET_MEANS = np.array([388.44858, -3.4721153, 1.3899297], np.float32)
DEFAULT_TARGET_STDS = np.array([23.563368, 7.703939, 1.0439132], np.float32)


# These 3x3 color-space matmuls are negligible FLOPs but precision-critical
# (they sit inside a log/exp sandwich): pin them to full f32 so the TPU MXU
# does not run them at bf16 default precision.
_PRECISE = jax.lax.Precision.HIGHEST


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB [0,255] float -> Ruderman lαβ. Shape (..., 3)."""
    rgb = jnp.maximum(rgb, 1.0)  # avoid log(0); matches standard practice
    lms = jnp.matmul(rgb, _RGB2LMS.T, precision=_PRECISE)
    log_lms = jnp.log10(jnp.maximum(lms, 1e-8))
    return jnp.matmul(log_lms, _LOGLMS2LAB.T, precision=_PRECISE) * 100.0


def lab_to_rgb(lab: jnp.ndarray) -> jnp.ndarray:
    """Ruderman lαβ -> RGB [0,255] float."""
    log_lms = jnp.matmul(lab / 100.0, _LAB2LOGLMS.T, precision=_PRECISE)
    lms = jnp.power(10.0, log_lms)
    rgb = jnp.matmul(lms, _LMS2RGB.T, precision=_PRECISE)
    return jnp.clip(rgb, 0.0, 255.0)


class ReinhardFastNormalizer:
    """Reinhard color-transfer stain normalizer (fast variant, no brightness
    standardization). Stateless apply; targets are small constants baked into
    the compiled program."""

    def __init__(self, target_means=None, target_stds=None):
        self.target_means = jnp.asarray(
            DEFAULT_TARGET_MEANS if target_means is None else target_means,
            jnp.float32,
        )
        self.target_stds = jnp.asarray(
            DEFAULT_TARGET_STDS if target_stds is None else target_stds,
            jnp.float32,
        )

    def fit(self, target_rgb) -> "ReinhardFastNormalizer":
        """Set targets from a reference RGB uint8/float image."""
        lab = rgb_to_lab(jnp.asarray(target_rgb, jnp.float32))
        flat = lab.reshape(-1, 3)
        self.target_means = flat.mean(axis=0)
        self.target_stds = flat.std(axis=0)
        return self

    def __call__(self, rgb: jnp.ndarray) -> jnp.ndarray:
        """Normalize RGB [0,255] image(s); per-image statistics.

        Accepts (H, W, 3) or (N, H, W, 3); float32 in/out, range [0,255].
        """
        single = rgb.ndim == 3
        if single:
            rgb = rgb[None]
        lab = rgb_to_lab(rgb.astype(jnp.float32))
        mean = lab.mean(axis=(1, 2), keepdims=True)
        std = lab.std(axis=(1, 2), keepdims=True)
        lab = (lab - mean) / jnp.maximum(std, 1e-6) * self.target_stds + self.target_means
        out = lab_to_rgb(lab)
        return out[0] if single else out

    # slideflow UncertaintyInterface exposes `.rgb_to_rgb` (results.py:251-254)
    def rgb_to_rgb(self, rgb):
        return self(rgb)


def per_image_standardization(x: jnp.ndarray) -> jnp.ndarray:
    """tf.image.per_image_standardization semantics (results.py:255):
    (x - mean) / max(std, 1/sqrt(num_elements)), computed per image over all
    dimensions except the leading batch dim (if 4D)."""
    x = x.astype(jnp.float32)
    if x.ndim == 3:
        axes = (0, 1, 2)
        n = x.size
        mean = x.mean()
        std = x.std()
        return (x - mean) / jnp.maximum(std, 1.0 / jnp.sqrt(float(n)))
    axes = tuple(range(1, x.ndim))
    n = float(np.prod(x.shape[1:]))
    mean = x.mean(axis=axes, keepdims=True)
    std = x.std(axis=axes, keepdims=True)
    return (x - mean) / jnp.maximum(std, 1.0 / jnp.sqrt(n))


def inference_preprocess(images_u8, normalizer):
    """uint8 tile batch -> model input for the INFERENCE paths (UQ/eval
    prediction; reference results.py:251-255). On a real TPU with the
    reinhard_fast normalizer this takes the fused single-HBM-round-trip
    Pallas kernel (ops/fused_preprocess.py, bf16 out, ~1e-5 rel); elsewhere
    the exact f32 XLA chain. Training keeps trainer.preprocess (f32)."""
    from ..ops.fused_preprocess import fused_preprocess, use_fused_preprocess

    if (use_fused_preprocess()
            and type(normalizer) is ReinhardFastNormalizer
            and images_u8.dtype == jnp.uint8):
        return fused_preprocess(images_u8, normalizer)
    x = images_u8.astype(jnp.float32)
    if normalizer is not None:
        x = normalizer(x)
    return per_image_standardization(x)


def make_normalizer(name):
    """Normalizer factory keyed on the hp.normalizer string."""
    if name is None or name == "none":
        return None
    if name in ("reinhard_fast", "reinhard-fast"):
        return ReinhardFastNormalizer()
    if name == "reinhard":
        # Full Reinhard adds brightness standardization (percentile scaling);
        # implemented as fast-variant plus luminance rescale.
        return ReinhardNormalizer()
    raise ValueError(f"Unknown normalizer: {name}")


class ReinhardNormalizer(ReinhardFastNormalizer):
    """Full Reinhard: brightness-standardize (scale so the 95th percentile
    of luminance maps to 240) before the lαβ transfer."""

    def __call__(self, rgb: jnp.ndarray) -> jnp.ndarray:
        single = rgb.ndim == 3
        if single:
            rgb = rgb[None]
        rgb = rgb.astype(jnp.float32)
        lum = rgb.max(axis=-1)
        p95 = jnp.percentile(lum.reshape(lum.shape[0], -1), 95.0, axis=1)
        scale = 240.0 / jnp.maximum(p95, 1.0)
        rgb = jnp.clip(rgb * scale[:, None, None, None], 0, 255)
        out = super().__call__(rgb)
        return out[0] if single else out
