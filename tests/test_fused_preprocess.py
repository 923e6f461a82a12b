"""Fused preprocessing kernel (ops/fused_preprocess.py) — interpret-mode
parity vs the exact XLA chain per_image_standardization(reinhard_fast(x))
(data/normalize.py; reference results.py:251-255)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biscuit_tpu.data.normalize import (
    ReinhardFastNormalizer,
    ReinhardNormalizer,
    inference_preprocess,
    make_normalizer,
    per_image_standardization,
)
from biscuit_tpu.ops.fused_preprocess import fused_preprocess


def _ref(x_u8, norm):
    return per_image_standardization(norm(jnp.asarray(x_u8, jnp.float32)))


class TestFusedPreprocess:
    @pytest.mark.parametrize("shape", [(4, 32, 32, 3), (2, 37, 41, 3),
                                       (8, 16, 16, 3)])
    def test_matches_xla_chain(self, shape):
        rng = np.random.default_rng(0)
        x = rng.integers(0, 255, shape, dtype=np.uint8)
        norm = make_normalizer("reinhard_fast")
        ref = np.asarray(_ref(x, norm))
        got = np.asarray(fused_preprocess(
            jnp.asarray(x), norm, out_dtype=jnp.float32, interpret=True))
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 5e-5

    def test_custom_fit_targets(self):
        rng = np.random.default_rng(1)
        x = rng.integers(0, 255, (2, 24, 24, 3), dtype=np.uint8)
        target = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
        norm = ReinhardFastNormalizer().fit(target)
        ref = np.asarray(_ref(x, norm))
        got = np.asarray(fused_preprocess(
            jnp.asarray(x), norm, out_dtype=jnp.float32, interpret=True))
        assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-5

    def test_bf16_output_close(self):
        rng = np.random.default_rng(2)
        x = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
        norm = make_normalizer("reinhard_fast")
        ref = np.asarray(_ref(x, norm))
        got = np.asarray(fused_preprocess(
            jnp.asarray(x), norm, interpret=True), np.float32)
        assert got.dtype == np.float32  # upcast view of bf16 values
        assert np.abs(got - ref).max() < 0.02  # bf16 rounding of ~[-2, 2]

    def test_inference_preprocess_dispatch(self):
        """On CPU the fused path is off: inference_preprocess must equal
        the exact chain bitwise; the full-Reinhard subclass never takes
        the fused path (brightness step not in the kernel)."""
        rng = np.random.default_rng(3)
        x = rng.integers(0, 255, (2, 16, 16, 3), dtype=np.uint8)
        norm = make_normalizer("reinhard_fast")
        np.testing.assert_array_equal(
            np.asarray(inference_preprocess(jnp.asarray(x), norm)),
            np.asarray(_ref(x, norm)))
        assert type(make_normalizer("reinhard")) is ReinhardNormalizer


@pytest.mark.tpu
class TestFusedPreprocessTPU:
    def test_on_chip_matches_xla_chain(self):
        """Compiled (non-interpret) kernel vs the exact f32 chain on the
        real chip, at the production tile size."""
        rng = np.random.default_rng(0)
        x = rng.integers(0, 255, (16, 299, 299, 3), dtype=np.uint8)
        norm = make_normalizer("reinhard_fast")
        ref = np.asarray(_ref(x, norm))
        got = np.asarray(fused_preprocess(
            jnp.asarray(x), norm, out_dtype=jnp.float32), np.float32)
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 1e-4
