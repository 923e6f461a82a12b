"""Fused strided Xception block kernel (ops/fused_block.py) — interpret-
mode parity vs the Flax XceptionBlock, plus the full fused-trunk
composition (stem -> fused entry blocks -> fused middle -> fused exit
block -> exit tail) against model.apply(method='features').

Reference architecture: Keras Xception blocks 2-4/13 (Chollet 2017);
models/xception.py XceptionBlock. bf16 tolerance ~1e-2 relative (the XLA
path itself is bf16).
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biscuit_tpu.models.xception import XceptionBlock, build_model
from biscuit_tpu.ops.fused_block import (
    fused_strided_block,
    stack_block_weights,
)


def _jittered_block(H, W, Cin, F, relu_first, seed=0, N=4):
    block = XceptionBlock(F, strides=2, relu_first=relu_first,
                          dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(rng, (N, H, W, Cin), jnp.float32) * 2.0
    variables = block.init(rng, x, False)
    v = flax.core.unfreeze(variables)
    counter = [0]

    def jitter(t):
        counter[0] += 1
        return t + 0.3 * jax.random.normal(
            jax.random.PRNGKey(counter[0]), t.shape)

    v["batch_stats"] = jax.tree.map(
        lambda t: jnp.abs(jitter(t)) + 0.1, v["batch_stats"])
    v["params"] = jax.tree.map(jitter, v["params"])
    return block, flax.core.freeze(v), x


def _rel_err(got, ref):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    return np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)


CASES = [
    # (H, W, Cin, F, relu_first, hs) — covers even/odd H and W, unequal
    # sep widths (exit-block shape), multi-strip + ragged-strip +
    # single-strip paths (hs must be divisible by 6).
    (14, 14, 8, (8, 16), True, 6),
    (13, 13, 8, (8, 16), True, 6),
    (16, 13, 8, (16, 16), False, 6),
    (19, 19, 16, (16, 24), True, 18),
    (12, 18, 8, (8, 24), False, 6),
]


class TestFusedBlockParity:
    @pytest.mark.parametrize("H,W,Cin,F,relu_first,hs", CASES)
    def test_matches_flax_block(self, H, W, Cin, F, relu_first, hs):
        block, variables, x = _jittered_block(H, W, Cin, F, relu_first)
        ref = block.apply(variables, jnp.asarray(x, jnp.bfloat16), False)
        wts = stack_block_weights(
            variables["params"], variables["batch_stats"])
        got = fused_strided_block(
            jnp.asarray(x, jnp.bfloat16), wts, relu_first=relu_first,
            hs=hs, interpret=True)
        assert got.shape == ref.shape
        assert _rel_err(got, ref) < 2e-2

    def test_ragged_strip_grid(self):
        """H not divisible by hs exercises Pallas partial-block semantics
        (dropped out-of-range writes, masked halo reads)."""
        H, W, Cin, F = 22, 10, 8, (8, 8)
        block, variables, x = _jittered_block(H, W, Cin, F, True, seed=3)
        ref = block.apply(variables, jnp.asarray(x, jnp.bfloat16), False)
        wts = stack_block_weights(
            variables["params"], variables["batch_stats"])
        got = fused_strided_block(jnp.asarray(x, jnp.bfloat16), wts,
                                  relu_first=True, hs=6, interpret=True)
        assert got.shape == ref.shape
        assert _rel_err(got, ref) < 2e-2


class TestFusedTrunkComposition:
    def test_full_fused_trunk_matches_features(self):
        """stem -> fused entry0..2 -> fused middle -> fused exit block ->
        exit tail == model features (tiny arch, interpret mode)."""
        from biscuit_tpu.hp import ModelParams
        from biscuit_tpu.ops.fused_sepconv import trunk_features_fused

        hp = ModelParams(model="xception_tiny", tile_px=32, normalizer=None)
        model = build_model(hp)
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (4, 32, 32, 3), jnp.float32)
        variables = model.init({"params": rng, "dropout": rng}, x,
                               train=False)
        params, bs = variables["params"], variables["batch_stats"]
        ref = model.apply(variables, x, train=False, method="features")
        got = trunk_features_fused(model, params, bs, x, interpret=True,
                                   fuse_blocks=True)
        assert got.shape == ref.shape
        assert _rel_err(got, ref) < 2e-2

    def test_stage_seams_compose(self):
        """stem+entry blocks == trunk_entry; exit_block+exit_tail ==
        trunk_exit (pure Flax, f32 — validates the new stage seams)."""
        from biscuit_tpu.models.xception import XceptionClassifier

        model = XceptionClassifier(arch="xception_tiny",
                                   compute_dtype=jnp.float32)
        rng = jax.random.PRNGKey(1)
        x = jax.random.normal(rng, (2, 32, 32, 3), jnp.float32)
        variables = model.init({"params": rng, "dropout": rng}, x,
                               train=False)
        ref_entry = model.apply(variables, x, train=False,
                                method="trunk_entry")
        h = model.apply(variables, x, train=False, method="trunk_stem")
        for i in range(3):
            blk = XceptionBlock(
                {0: (16, 16), 1: (32, 32), 2: (48, 48)}[i], strides=2,
                relu_first=(i != 0), dtype=jnp.float32)
            h = blk.apply(
                {"params": variables["params"]["backbone"][f"entry{i}"],
                 "batch_stats":
                     variables["batch_stats"]["backbone"][f"entry{i}"]},
                h, False)
        np.testing.assert_allclose(np.asarray(h), np.asarray(ref_entry),
                                   atol=1e-5)
        mid = model.apply(variables, ref_entry, train=False,
                          method="trunk_middle")
        ref_feats = model.apply(variables, mid, train=False,
                                method="trunk_exit")
        blk = XceptionBlock((48, 64), strides=2, relu_first=True,
                            dtype=jnp.float32)
        h2 = blk.apply(
            {"params": variables["params"]["backbone"]["exit_block"],
             "batch_stats":
                 variables["batch_stats"]["backbone"]["exit_block"]},
            mid, False)
        feats = model.apply(variables, h2, train=False,
                            method="trunk_exit_tail")
        np.testing.assert_allclose(np.asarray(feats),
                                   np.asarray(ref_feats), atol=1e-5)


@pytest.mark.tpu
class TestFusedBlockTPU:
    def test_entry0_geometry_on_chip(self):
        """Compiled kernel at the real entry0 geometry vs the XLA block."""
        block, variables, x = _jittered_block(
            150, 150, 64, (128, 128), False, N=8)
        ref = block.apply(variables, jnp.asarray(x, jnp.bfloat16), False)
        wts = stack_block_weights(
            variables["params"], variables["batch_stats"])
        got = fused_strided_block(jnp.asarray(x, jnp.bfloat16), wts,
                                  relu_first=False)
        assert got.shape == ref.shape
        assert _rel_err(got, ref) < 2e-2

    def test_exit_geometry_on_chip(self):
        block, variables, x = _jittered_block(
            19, 19, 32, (32, 48), True, N=8)
        ref = block.apply(variables, jnp.asarray(x, jnp.bfloat16), False)
        wts = stack_block_weights(
            variables["params"], variables["batch_stats"])
        got = fused_strided_block(jnp.asarray(x, jnp.bfloat16), wts,
                                  relu_first=True, hs=18)
        assert _rel_err(got, ref) < 2e-2

    def test_full_fused_trunk_on_chip(self):
        """Opt-in fully-fused trunk (stem -> fused entry blocks -> fused
        middle -> fused exit block -> tail) vs the default fused-middle
        path on the real chip, full 299px Xception."""
        from biscuit_tpu.hp import nature2022_params
        from biscuit_tpu.ops.fused_sepconv import trunk_features_fused

        hp = nature2022_params()
        model = build_model(hp)
        cpu = jax.devices("cpu")[0]
        rng = jax.random.PRNGKey(0)
        with jax.default_device(cpu):
            v = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((2, 299, 299, 3), jnp.float32),
                           train=False)
        v = jax.device_put(v, jax.devices()[0])
        params, bs = v["params"], v["batch_stats"]
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((16, 299, 299, 3)),
            jnp.float32)
        a = np.asarray(trunk_features_fused(model, params, bs, x,
                                            fuse_blocks=False), np.float32)
        b = np.asarray(trunk_features_fused(model, params, bs, x,
                                            fuse_blocks=True), np.float32)
        assert np.abs(a - b).max() / np.abs(a).max() < 3e-2
