"""Fused sep+BN unit backward (ops/fused_unit_bwd.py) correctness.

Layers of evidence, mirroring the fused-kernel test conventions
(test_fused_sepconv.py):
  1. manual-VJP reference vs jax autodiff of the same forward — exact in
     f32 (<=2e-5), bounded in bf16 (the documented f32-gd deviation);
  2. Pallas kernel (interpret mode) vs the reference, including
     multi-grid-step weight-gradient accumulation;
  3. the custom_vjp wrapper's forward vs the actual flax unit
     (SeparableConv + nn.BatchNorm) — the integration seam's numerics;
  4. the custom_vjp wrapper's gradients vs flax autodiff, bounded.

On-chip (real v5e) parity is covered by the tpu-marked test; timing by
benchmarks/bench_unit_bwd.py.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from biscuit_tpu.ops import fused_unit_bwd as fub

EPS = 1e-5


def make_unit(rng, n, h, w, ci, co, dt):
    a = jnp.asarray(rng.standard_normal((n, h, w, ci)), dt)
    wdw = jnp.asarray(rng.standard_normal((3, 3, 1, ci)) * 0.2, jnp.float32)
    wpw = jnp.asarray(rng.standard_normal((1, 1, ci, co)) * 0.2, jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(co) * 0.1 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(co) * 0.1, jnp.float32)
    gy = jnp.asarray(rng.standard_normal((n, h, w, co)), dt)
    return a, wdw, wpw, gamma, beta, gy


def autodiff_grads(a, wdw, wpw, gamma, beta, gy, relu_first):
    def loss(a, wdw, wpw, gamma, beta):
        y, _, _, _ = fub.unit_fwd(a, wdw, wpw, gamma, beta, EPS, relu_first)
        return jnp.sum(y.astype(jnp.float32) * gy.astype(jnp.float32))

    return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(a, wdw, wpw, gamma, beta)


def relerr(x, y):
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.float32)
    return np.max(np.abs(x - y)) / (np.max(np.abs(y)) + 1e-9)


NAMES = ("da", "dwdw", "dwpw", "dgamma", "dbeta")


class TestReferenceVsAutodiff:
    @pytest.mark.parametrize("relu_first", [True, False])
    def test_f32_exact(self, relu_first):
        rng = np.random.default_rng(0)
        a, wdw, wpw, gamma, beta, gy = make_unit(
            rng, 4, 9, 7, 8, 16, jnp.float32)
        grads = autodiff_grads(a, wdw, wpw, gamma, beta, gy, relu_first)
        _, mu, var, (r, d, p) = fub.unit_fwd(a, wdw, wpw, gamma, beta, EPS,
                                             relu_first)
        ours = fub.unit_bwd_reference(gy, r, d, p, wdw, wpw, gamma, mu, var,
                                      EPS, relu_first)
        for name, o, g in zip(NAMES, ours, grads):
            assert relerr(o, g) < 2e-5, name

    @pytest.mark.parametrize("relu_first", [True, False])
    def test_bf16_bounded(self, relu_first):
        rng = np.random.default_rng(1)
        a, wdw, wpw, gamma, beta, gy = make_unit(
            rng, 4, 9, 7, 8, 16, jnp.bfloat16)
        grads = autodiff_grads(a, wdw, wpw, gamma, beta, gy, relu_first)
        _, mu, var, (r, d, p) = fub.unit_fwd(a, wdw, wpw, gamma, beta, EPS,
                                             relu_first)
        ours = fub.unit_bwd_reference(gy, r, d, p, wdw, wpw, gamma, mu, var,
                                      EPS, relu_first)
        # bf16 path: only deviation is where each chain rounds to bf16.
        for name, o, g in zip(NAMES, ours, grads):
            assert relerr(o, g) < 3e-2, name


class TestPallasInterpretVsReference:
    @pytest.mark.parametrize("relu_first", [True, False])
    def test_small(self, relu_first):
        rng = np.random.default_rng(2)
        a, wdw, wpw, gamma, beta, gy = make_unit(
            rng, 4, 9, 7, 8, 16, jnp.bfloat16)
        _, mu, var, (r, d, p) = fub.unit_fwd(a, wdw, wpw, gamma, beta, EPS,
                                             relu_first)
        ref = fub.unit_bwd_reference(gy, r, d, p, wdw, wpw, gamma, mu, var,
                                     EPS, relu_first)
        pal = fub.unit_bwd_pallas(gy, r, d, p, wdw, wpw, gamma, mu, var,
                                  EPS, relu_first, interpret=True)
        for name, o, g in zip(NAMES, pal, ref):
            assert relerr(o, g) < 2e-4, name

    @pytest.mark.parametrize("relu_first", [True, False])
    def test_strip_kernel_small(self, relu_first):
        rng = np.random.default_rng(7)
        a, wdw, wpw, gamma, beta, gy = make_unit(
            rng, 4, 9, 7, 8, 16, jnp.bfloat16)
        _, mu, var, (r, d, p) = fub.unit_fwd(a, wdw, wpw, gamma, beta, EPS,
                                             relu_first)
        ref = fub.unit_bwd_reference(gy, r, d, p, wdw, wpw, gamma, mu, var,
                                     EPS, relu_first)
        pal = fub.unit_bwd_pallas_strips(gy, r, d, p, wdw, wpw, gamma, mu,
                                         var, EPS, relu_first, hs=3,
                                         interpret=True)
        # da tolerance 1e-3: the kernel's distributed-A gp factoring is
        # ~1e-7 off the reference's, which can flip a bf16 rounding tie
        # in the cast feeding the pw dgrad (one bf16 ulp of gd).
        for name, o, g in zip(NAMES, pal, ref):
            assert relerr(o, g) < (1e-3 if name == "da" else 2e-4), name

    def test_strip_kernel_multi_strip_ragged(self):
        # H=19 with hs=6 -> 4 strips, last ragged (1 row); N=16 -> 2
        # image groups. Exercises halo clamping at both edges, the row
        # masks, and accumulator behavior across the 2-D grid.
        rng = np.random.default_rng(8)
        a, wdw, wpw, gamma, beta, gy = make_unit(
            rng, 16, 19, 13, 8, 16, jnp.bfloat16)
        _, mu, var, (r, d, p) = fub.unit_fwd(a, wdw, wpw, gamma, beta, EPS,
                                             True)
        ref = fub.unit_bwd_reference(gy, r, d, p, wdw, wpw, gamma, mu, var,
                                     EPS, True)
        pal = fub.unit_bwd_pallas_strips(gy, r, d, p, wdw, wpw, gamma, mu,
                                         var, EPS, True, hs=6,
                                         interpret=True)
        for name, o, g in zip(NAMES, pal, ref):
            assert relerr(o, g) < (1e-3 if name == "da" else 2e-4), name

    def test_multi_grid_step_accumulation(self):
        # N=16 with tiny spatial -> nb=8, two sequential grid steps; the
        # weight-grad accumulators must sum across them.
        rng = np.random.default_rng(3)
        a, wdw, wpw, gamma, beta, gy = make_unit(
            rng, 16, 5, 5, 8, 16, jnp.bfloat16)
        _, mu, var, (r, d, p) = fub.unit_fwd(a, wdw, wpw, gamma, beta, EPS,
                                             True)
        ref = fub.unit_bwd_reference(gy, r, d, p, wdw, wpw, gamma, mu, var,
                                     EPS, True)
        pal = fub.unit_bwd_pallas(gy, r, d, p, wdw, wpw, gamma, mu, var,
                                  EPS, True, interpret=True)
        for name, o, g in zip(NAMES, pal, ref):
            assert relerr(o, g) < 2e-4, name


class TestCustomVjpVsFlax:
    def _flax_unit(self, ci, co, relu_first):
        import flax.linen as nn

        class Unit(nn.Module):
            @nn.compact
            def __call__(self, x, train: bool = True):
                if relu_first:
                    x = nn.relu(x)
                x = nn.Conv(ci, (3, 3), feature_group_count=ci,
                            use_bias=False, dtype=jnp.bfloat16,
                            name="depthwise")(x)
                x = nn.Conv(co, (1, 1), use_bias=False,
                            dtype=jnp.bfloat16, name="pointwise")(x)
                return nn.BatchNorm(use_running_average=not train,
                                    dtype=jnp.bfloat16, name="bn")(x)

        return Unit()

    @pytest.mark.parametrize("relu_first", [True, False])
    def test_forward_matches_flax(self, relu_first):
        rng = np.random.default_rng(4)
        ci, co = 8, 16
        a, wdw, wpw, gamma, beta, gy = make_unit(
            rng, 4, 9, 7, ci, co, jnp.bfloat16)
        unit = self._flax_unit(ci, co, relu_first)
        variables = unit.init(jax.random.PRNGKey(0), a)
        variables = jax.tree_util.tree_map(lambda x: x, variables)
        params = {
            "depthwise": {"kernel": wdw},
            "pointwise": {"kernel": wpw},
            "bn": {"scale": gamma, "bias": beta},
        }
        y_flax, updates = unit.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            a, train=True, mutable=["batch_stats"])
        y, mu, var = fub.sep_bn_unit(a, wdw, wpw, gamma, beta, EPS, relu_first,
                                     "reference")
        np.testing.assert_array_equal(np.asarray(y_flax, np.float32),
                                      np.asarray(y, np.float32))
        # flax's updated running stats blend batch mean/var with momentum
        # 0.99; recover the batch stats and compare.
        new_mean = np.asarray(updates["batch_stats"]["bn"]["mean"])
        new_var = np.asarray(updates["batch_stats"]["bn"]["var"])
        old_mean = np.asarray(variables["batch_stats"]["bn"]["mean"])
        old_var = np.asarray(variables["batch_stats"]["bn"]["var"])
        np.testing.assert_allclose(
            (new_mean - 0.99 * old_mean) / 0.01, np.asarray(mu),
            rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            (new_var - 0.99 * old_var) / 0.01, np.asarray(var),
            rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("relu_first", [True, False])
    def test_grads_match_flax(self, relu_first):
        rng = np.random.default_rng(5)
        ci, co = 8, 16
        a, wdw, wpw, gamma, beta, gy = make_unit(
            rng, 4, 9, 7, ci, co, jnp.bfloat16)
        unit = self._flax_unit(ci, co, relu_first)
        variables = unit.init(jax.random.PRNGKey(0), a)
        params = {
            "depthwise": {"kernel": wdw},
            "pointwise": {"kernel": wpw},
            "bn": {"scale": gamma, "bias": beta},
        }

        def flax_loss(params, a):
            y, _ = unit.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                a, train=True, mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32) * gy.astype(jnp.float32))

        gf_p, gf_a = jax.grad(flax_loss, argnums=(0, 1))(params, a)

        def fused_loss(params, a):
            y, _, _ = fub.sep_bn_unit(
                a, params["depthwise"]["kernel"], params["pointwise"]["kernel"],
                params["bn"]["scale"], params["bn"]["bias"], EPS, relu_first,
                "reference")
            return jnp.sum(y.astype(jnp.float32) * gy.astype(jnp.float32))

        gu_p, gu_a = jax.grad(fused_loss, argnums=(0, 1))(params, a)
        assert relerr(gu_a, gf_a) < 3e-2
        for path in (("depthwise", "kernel"), ("pointwise", "kernel"),
                     ("bn", "scale"), ("bn", "bias")):
            u, f = gu_p, gf_p
            for k in path:
                u, f = u[k], f[k]
            assert relerr(u, f) < 3e-2, path


@pytest.mark.tpu
@pytest.mark.skipif(os.environ.get("BISCUIT_TEST_TPU") != "1",
                    reason="real-chip test (BISCUIT_TEST_TPU=1)")
class TestOnChip:
    def test_kernel_vs_reference_on_chip(self):
        rng = np.random.default_rng(6)
        a, wdw, wpw, gamma, beta, gy = make_unit(
            rng, 16, 19, 19, 128, 128, jnp.bfloat16)
        _, mu, var, (r, d, p) = fub.unit_fwd(a, wdw, wpw, gamma, beta, EPS,
                                             True)
        ref = fub.unit_bwd_reference(gy, r, d, p, wdw, wpw, gamma, mu, var,
                                     EPS, True)
        pal = fub.unit_bwd_pallas(gy, r, d, p, wdw, wpw, gamma, mu, var,
                                  EPS, True)
        for name, o, g in zip(NAMES, pal, ref):
            assert relerr(o, g) < 5e-3, name

    def test_strip_kernel_vs_reference_on_chip(self):
        # 37x37: multi-strip (hs=24 -> 2 strips, ragged) at a real entry
        # geometry that fits a quick compile.
        rng = np.random.default_rng(9)
        a, wdw, wpw, gamma, beta, gy = make_unit(
            rng, 16, 37, 37, 128, 128, jnp.bfloat16)
        _, mu, var, (r, d, p) = fub.unit_fwd(a, wdw, wpw, gamma, beta, EPS,
                                             True)
        ref = fub.unit_bwd_reference(gy, r, d, p, wdw, wpw, gamma, mu, var,
                                     EPS, True)
        pal = fub.unit_bwd_pallas_strips(gy, r, d, p, wdw, wpw, gamma, mu,
                                         var, EPS, True)
        for name, o, g in zip(NAMES, pal, ref):
            assert relerr(o, g) < 5e-3, name
