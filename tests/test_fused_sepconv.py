"""Fused middle-flow kernel parity (ops/fused_sepconv.py), interpret mode.

Three layers of evidence: (1) the kernel vs an f32 NumPy reference of the
same math on random weights; (2) the kernel vs the model's own XLA bf16
middle flow (method='trunk_middle'); (3) end-to-end trunk features fused vs
plain. The on-chip (real v5e) run is covered by the tpu-marked test and
benchmarks/bench_kernels.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from biscuit_tpu.ops.fused_sepconv import (
    fused_middle_flow,
    stack_middle_weights,
    trunk_features_fused,
)


def numpy_middle_flow(x, dw, pw, sc, sh):
    """f32 reference: blocks of 3 x [relu -> dw3x3 SAME -> pw -> bn] with
    identity residual."""
    x = np.asarray(x, np.float64)
    dw, pw = np.asarray(dw, np.float64), np.asarray(pw, np.float64)
    sc, sh = np.asarray(sc, np.float64), np.asarray(sh, np.float64)
    n, h, w, c = x.shape
    u_total = dw.shape[0]
    for b in range(u_total // 3):
        res = x.copy()
        for u in range(3):
            uid = b * 3 + u
            a = np.maximum(x, 0.0)
            pad = np.zeros((n, h + 2, w + 2, c))
            pad[:, 1:h + 1, 1:w + 1] = a
            acc = np.zeros_like(x)
            for dy in range(3):
                for dx in range(3):
                    acc += pad[:, dy:dy + h, dx:dx + w] * dw[uid, dy * 3 + dx]
            y = acc.reshape(-1, c) @ pw[uid]
            y = y * sc[uid] + sh[uid]
            x = y.reshape(n, h, w, c)
        x = x + res
    return x


def rand_weights(rng, u, c, scale=0.15):
    dw = rng.normal(0, scale, (u, 9, c)).astype(np.float32)
    pw = rng.normal(0, scale / np.sqrt(c), (u, c, c)).astype(np.float32)
    sc = rng.uniform(0.8, 1.2, (u, c)).astype(np.float32)
    sh = rng.normal(0, 0.05, (u, c)).astype(np.float32)
    return dw, pw, sc, sh


class TestKernelVsNumpy:
    @pytest.mark.parametrize("shape,u", [
        ((4, 5, 5, 16), 3),    # one block, pad/tap geometry
        ((8, 9, 7, 32), 6),    # two blocks, rectangular, NB=8
        ((6, 3, 3, 8), 3),     # N not divisible by 8 -> nb=6
    ])
    def test_matches_f32_reference(self, shape, u):
        rng = np.random.RandomState(0)
        x = rng.normal(0, 1, shape).astype(np.float32)
        dw, pw, sc, sh = rand_weights(rng, u, shape[-1])
        got = np.asarray(fused_middle_flow(
            jnp.asarray(x), jnp.asarray(dw), jnp.asarray(pw),
            jnp.asarray(sc), jnp.asarray(sh), interpret=True,
        ))
        want = numpy_middle_flow(x, dw, pw, sc, sh)
        # Kernel runs the pw matmul in bf16 (as the XLA model path does);
        # the reference is f64.
        np.testing.assert_allclose(got, want, rtol=0.06, atol=0.06)

    def test_bf16_input_roundtrip(self):
        rng = np.random.RandomState(1)
        x = rng.normal(0, 1, (4, 5, 5, 16)).astype(np.float32)
        dw, pw, sc, sh = rand_weights(rng, 3, 16)
        out = fused_middle_flow(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(dw), jnp.asarray(pw),
            jnp.asarray(sc), jnp.asarray(sh), interpret=True,
        )
        assert out.dtype == jnp.bfloat16
        want = numpy_middle_flow(x, dw, pw, sc, sh)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), want, rtol=0.12, atol=0.12
        )


@pytest.fixture(scope="module")
def tiny_model_state():
    from biscuit_tpu.hp import ModelParams
    from biscuit_tpu.models.xception import build_model

    hp = ModelParams(model="xception_tiny", tile_px=32, hidden_layer_width=32)
    model = build_model(hp)
    x = jnp.asarray(
        np.random.RandomState(0).uniform(0, 255, (8, 32, 32, 3)),
        jnp.float32,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    )
    return model, variables, x


class TestModelIntegration:
    def test_stage_composition_equals_full(self, tiny_model_state):
        """entry -> middle -> exit == features (stage plumbing is lossless)."""
        model, variables, x = tiny_model_state
        full = model.apply(variables, x, train=False, method="features")
        h = model.apply(variables, x, train=False, method="trunk_entry")
        h = model.apply(variables, h, train=False, method="trunk_middle")
        staged = model.apply(variables, h, train=False, method="trunk_exit")
        np.testing.assert_array_equal(np.asarray(full), np.asarray(staged))

    def test_fused_middle_matches_xla_middle(self, tiny_model_state):
        model, variables, x = tiny_model_state
        h = model.apply(variables, x, train=False, method="trunk_entry")
        xla = model.apply(variables, h, train=False, method="trunk_middle")
        from biscuit_tpu.models.xception import ARCHS

        wts = stack_middle_weights(
            variables["params"]["backbone"],
            variables["batch_stats"]["backbone"],
            ARCHS["xception_tiny"]["middle_repeats"],
        )
        fused = np.asarray(fused_middle_flow(h, *wts, interpret=True),
                           np.float32)
        xla = np.asarray(xla, np.float32)
        # Untrained-init activations run ~1e2, so bf16 ulp is ~1: compare
        # scale-aware (measured: mean rel err 0.6%, p99 6.7% — pure bf16
        # rounding between the two orderings of the same math).
        scale = np.abs(xla).mean()
        assert np.abs(fused - xla).mean() / scale < 0.02
        np.testing.assert_allclose(fused, xla, rtol=0.15, atol=0.05 * scale)

    def test_trunk_features_fused_end_to_end(self, tiny_model_state):
        model, variables, x = tiny_model_state
        plain = model.apply(variables, x, train=False, method="features")
        fused = trunk_features_fused(
            model, variables["params"], variables["batch_stats"], x,
            interpret=True,
        )
        plain, fused = np.asarray(plain), np.asarray(fused)
        assert fused.shape == plain.shape
        # bf16 rounding differences amplified through exit flow + pool:
        # demand tight agreement relative to feature scale.
        scale = np.abs(plain).mean() + 1e-6
        assert np.abs(fused - plain).mean() / scale < 0.05

    def test_resnet_arch_rejected(self):
        from biscuit_tpu.hp import ModelParams
        from biscuit_tpu.models.xception import build_model

        hp = ModelParams(model="resnet_tiny", tile_px=32)
        model = build_model(hp)
        with pytest.raises(ValueError):
            trunk_features_fused(model, {}, {}, None)
