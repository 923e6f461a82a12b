"""Fused Pallas kernel: K-pass MC-dropout MLP head with on-chip mean/std.

This is the hot op of the BISCUIT UQ pipeline (BASELINE.json north star:
"K=30 MC-dropout stochastic passes vmapped on-chip, ... reduces per-tile
softmax mean/std without leaving HBM"). For each batch block it keeps the
head weights (published shape: 2048->1024->1024->2, ~6.3 MB bf16) resident
in VMEM and loops K times entirely on-chip:

    h1 = dropout(relu(feats @ W1 + b1))
    h2 = dropout(relu(h1 @ W2 + b2))
    p  = softmax(h2 @ W3p + b3p)         # W3 padded to 128 lanes
    acc_sum += p; acc_sq += p*p

emitting mean = acc_sum/K and std = sqrt(E[p^2] - mean^2). The features are
read from HBM once per tile; the K stochastic passes never touch HBM.
Dropout masks come from the per-core hardware PRNG (pltpu.prng_random_bits),
inverted-dropout scaled like Keras.

Matmuls run bf16 on the MXU with f32 accumulation. The class dimension
(C=2) is padded to 128 lanes with -1e9 logits so softmax ignores the pads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(seed_ref, feats_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
            b3_ref, mean_ref, std_ref, *, k: int, dropout: float,
            n_classes: int):
    block = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + block)

    feats = feats_ref[:].astype(jnp.bfloat16)
    w1 = w1_ref[:]
    w2 = w2_ref[:]
    w3 = w3_ref[:]
    b1 = b1_ref[:]
    b2 = b2_ref[:]
    b3 = b3_ref[:]

    keep_scale = 1.0 / (1.0 - dropout)
    # drop if rand_uint32 < dropout * 2^32
    thresh = np.uint32(min(int(dropout * (1 << 32)), (1 << 32) - 1))

    tile_b = feats.shape[0]
    hidden = w1.shape[1]
    padded_c = w3.shape[1]

    def one_pass(_, acc):
        acc_sum, acc_sq = acc
        h = jnp.dot(feats, w1, preferred_element_type=jnp.float32) + b1
        h = jnp.maximum(h, 0.0)
        # prng_random_bits yields int32-typed bits; bitcast before the
        # unsigned threshold compare (else half the lanes read negative).
        bits = pltpu.bitcast(
            pltpu.prng_random_bits((tile_b, hidden)), jnp.uint32
        )
        h = jnp.where(bits >= thresh, h * keep_scale, 0.0)
        h = h.astype(jnp.bfloat16)

        h = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
        h = jnp.maximum(h, 0.0)
        bits = pltpu.bitcast(
            pltpu.prng_random_bits((tile_b, hidden)), jnp.uint32
        )
        h = jnp.where(bits >= thresh, h * keep_scale, 0.0)
        h = h.astype(jnp.bfloat16)

        logits = jnp.dot(h, w3, preferred_element_type=jnp.float32) + b3
        # b3 pads are -1e9: softmax over the full 128 lanes is exact softmax
        # over the real classes.
        z = logits - jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(z)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        return acc_sum + p, acc_sq + p * p

    zeros = jnp.zeros((tile_b, padded_c), jnp.float32)
    acc_sum, acc_sq = jax.lax.fori_loop(0, k, one_pass, (zeros, zeros))
    mean = acc_sum / k
    var = jnp.maximum(acc_sq / k - mean * mean, 0.0)
    mean_ref[:] = mean
    std_ref[:] = jnp.sqrt(var)


@functools.partial(
    jax.jit, static_argnames=("k", "dropout", "tile_b", "interpret")
)
def _mcd_head_call(feats, w1, b1, w2, b2, w3p, b3p, seed, *, k: int,
                   dropout: float, tile_b: int, interpret: bool = False):
    n, f = feats.shape
    padded_c = w3p.shape[1]
    hidden = w1.shape[1]
    grid = (n // tile_b,)
    flops = 2 * k * n * (f * hidden + hidden * hidden + hidden * padded_c)
    out_shape = jax.ShapeDtypeStruct((n, padded_c), jnp.float32)
    mean, std = pl.pallas_call(
        functools.partial(_kernel, k=k, dropout=dropout, n_classes=padded_c),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec((tile_b, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, padded_c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, padded_c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, padded_c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, padded_c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[out_shape, out_shape],
        compiler_params=pltpu.CompilerParams(
            # Head weights (~6.3 MB bf16) + double-buffered feature blocks;
            # the default 16 MB scoped limit is too tight once the pipeline
            # double-buffers the (constant) weight blocks.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n * f * 4 + 2 * n * padded_c * 4,
            transcendentals=k * n * padded_c,
        ),
        # TPU-interpret mode for CPU testing. NOTE: the interpreter stubs
        # pltpu.prng_random_bits to zeros, so only dropout=0.0 behavior is
        # exact off-chip; stochastic behavior is validated on real TPU.
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, feats, w1, b1, w2, b2, w3p, b3p)
    return mean, std


def mcd_head_pallas(head_params, feats, key, k: int = 30,
                    dropout: float = 0.1, tile_b: int = 256,
                    interpret: bool = False):
    """K-pass MC-dropout head on TPU via the fused kernel.

    Args:
        head_params: flax param tree of models.xception.Head with exactly two
            hidden layers ('hidden0', 'hidden1', 'logits').
        feats: (B, F) f32 pooled backbone features.
        key: PRNG key (folded to a 32-bit seed for the hardware PRNG).
    Returns:
        (mean (B, C), std (B, C)) of softmax over k samples.
    """
    w1 = head_params["hidden0"]["kernel"].astype(jnp.bfloat16)
    b1 = head_params["hidden0"]["bias"].astype(jnp.float32)[None, :]
    w2 = head_params["hidden1"]["kernel"].astype(jnp.bfloat16)
    b2 = head_params["hidden1"]["bias"].astype(jnp.float32)[None, :]
    w3 = head_params["logits"]["kernel"].astype(jnp.bfloat16)
    b3 = head_params["logits"]["bias"].astype(jnp.float32)

    n, f = feats.shape
    hidden = w1.shape[1]
    n_classes = w3.shape[1]
    padded_c = LANE

    # Pad class dim to one lane tile; pad logits bias with -1e9 so softmax
    # over the padded lanes equals softmax over the real classes.
    w3p = jnp.zeros((hidden, padded_c), jnp.bfloat16).at[:, :n_classes].set(w3)
    b3p = jnp.full((1, padded_c), -1e9, jnp.float32).at[0, :n_classes].set(b3)

    tile_b = min(tile_b, _round_up(n, 8))
    n_pad = _round_up(n, tile_b)
    feats_p = (
        jnp.zeros((n_pad, f), jnp.float32).at[:n].set(feats)
        if n_pad != n
        else feats.astype(jnp.float32)
    )

    seed = jax.random.key_data(key).reshape(-1)[-1].astype(jnp.int32)
    mean, std = _mcd_head_call(
        feats_p, w1, b1, w2, b2, w3p, b3p,
        seed[None] if seed.ndim == 0 else seed.reshape(1),
        k=k, dropout=dropout, tile_b=tile_b, interpret=interpret,
    )
    return mean[:n, :n_classes], std[:n, :n_classes]
