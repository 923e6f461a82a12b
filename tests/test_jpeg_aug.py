"""On-chip JPEG re-compression augmentation (the 'j' of 'xyrjb').

The reference policy (/root/reference/biscuit/hp.py:24) applies random JPEG
re-compression through slideflow's tf.data host pipeline; our default path
runs libjpeg's lossy core on-chip as DCT matmuls (data/augment.py). These
tests pin (a) parity of the lossy transform against the real codec (PIL /
libjpeg) to a small fraction of the artifact magnitude, and (b) the sampling
contract shared with jpeg_augment_host.
"""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biscuit_tpu.data.augment import jpeg_augment_batch


def _tissue_like(seed=0, h=299, w=299):
    """Smooth structure + noise, spectrally closer to an H&E tile than
    white noise (which has no energy for JPEG to discard)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [128 + 80 * np.sin(xx / 23) * np.cos(yy / 31),
         128 + 60 * np.cos(xx / 17 + yy / 41),
         128 + 70 * np.sin((xx + yy) / 29)], -1)
    return np.clip(base + rng.normal(0, 12, base.shape), 0, 255).astype(
        np.uint8)


def _pil_jpeg(a, q, subsampling):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(a).save(buf, format="JPEG", quality=q,
                            subsampling=subsampling)
    buf.seek(0)
    return np.asarray(Image.open(buf).convert("RGB")).astype(np.float32)


class TestJpegParity:
    @pytest.mark.parametrize("quality", [50, 75, 90])
    def test_matches_libjpeg_420(self, quality):
        """Our DCT path reproduces libjpeg's lossy transform (4:2:0, the
        PIL/libjpeg default) to <15% of the artifact magnitude: the
        residual is float-vs-islow DCT + rounding-convention noise."""
        img = _tissue_like()
        pil = _pil_jpeg(img, quality, subsampling=2)
        ours = np.asarray(
            jpeg_augment_batch(jnp.asarray(img[None]), jax.random.PRNGKey(0),
                               prob=1.0, quality_range=(quality, quality + 1))
        ).astype(np.float32)[0]
        artifact = np.abs(img.astype(np.float32) - pil).mean()
        resid = np.abs(ours - pil).mean()
        assert artifact > 4.0  # the codec actually did something lossy
        assert resid < 0.15 * artifact
        assert resid < 1.5

    def test_matches_libjpeg_444(self):
        """Without chroma subsampling the only deviations are DCT precision
        and rounding conventions — residual well under half a level."""
        img = _tissue_like(seed=1)
        pil = _pil_jpeg(img, 75, subsampling=0)
        ours = np.asarray(
            jpeg_augment_batch(jnp.asarray(img[None]), jax.random.PRNGKey(0),
                               prob=1.0, quality_range=(75, 76),
                               subsample=False)
        ).astype(np.float32)[0]
        assert np.abs(ours - pil).mean() < 0.5

    def test_high_quality_near_identity(self):
        img = _tissue_like(seed=2)
        ours = np.asarray(
            jpeg_augment_batch(jnp.asarray(img[None]), jax.random.PRNGKey(0),
                               prob=1.0, quality_range=(99, 100),
                               subsample=False)
        ).astype(np.float32)[0]
        assert np.abs(ours - img.astype(np.float32)).mean() < 1.0


class TestJpegSamplingContract:
    def test_prob_gating_and_dtype(self):
        imgs = np.stack([_tissue_like(seed=s, h=32, w=32) for s in range(64)])
        out = np.asarray(
            jpeg_augment_batch(jnp.asarray(imgs), jax.random.PRNGKey(3)))
        assert out.dtype == np.uint8 and out.shape == imgs.shape
        changed = (out != imgs).any(axis=(1, 2, 3))
        # JPEG_PROB=0.5 over 64 rows: both populations must exist.
        assert 8 <= changed.sum() <= 56
        np.testing.assert_array_equal(out[~changed], imgs[~changed])

    def test_prob_zero_is_identity(self):
        imgs = _tissue_like(h=24, w=24)[None]
        out = np.asarray(
            jpeg_augment_batch(jnp.asarray(imgs), jax.random.PRNGKey(0),
                               prob=0.0))
        np.testing.assert_array_equal(out, imgs)

    def test_deterministic_given_key(self):
        imgs = jnp.asarray(
            np.stack([_tissue_like(seed=s, h=40, w=40) for s in range(4)]))
        a = jpeg_augment_batch(imgs, jax.random.PRNGKey(7))
        b = jpeg_augment_batch(imgs, jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_quality_spread_matches_host_contract(self):
        """Per-image quality draws span [50, 100) like jpeg_augment_host's
        rng.integers(50, 100): lower quality => larger deviation, so the
        per-image artifact magnitudes must differ across a batch."""
        img = _tissue_like(h=64, w=64)
        imgs = jnp.asarray(np.stack([img] * 32))
        out = np.asarray(
            jpeg_augment_batch(imgs, jax.random.PRNGKey(11), prob=1.0)
        ).astype(np.float32)
        mads = np.abs(out - img.astype(np.float32)).mean(axis=(1, 2, 3))
        assert mads.std() > 0.2  # distinct qualities, not one shared draw

    def test_nonsquare_and_padding(self):
        """Non-multiple-of-16 shapes pad with edge replication and crop
        back; output shape is preserved."""
        img = _tissue_like(h=37, w=61)
        out = np.asarray(
            jpeg_augment_batch(jnp.asarray(img[None]), jax.random.PRNGKey(1),
                               prob=1.0))
        assert out.shape == (1, 37, 61, 3)

    def test_host_path_env_toggle(self, monkeypatch):
        """BISCUIT_JPEG_HOST=1 reroutes 'j' to the PIL codec (and thereby
        re-engages the host jpeg_aug gate in the pipeline/trainer)."""
        from biscuit_tpu.data.augment import jpeg_on_host

        monkeypatch.delenv("BISCUIT_JPEG_HOST", raising=False)
        assert not jpeg_on_host()
        monkeypatch.setenv("BISCUIT_JPEG_HOST", "1")
        assert jpeg_on_host()
