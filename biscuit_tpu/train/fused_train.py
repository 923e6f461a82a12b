"""Functional Xception trunk forward (train mode) with fused unit backwards.

The flax train step (trainer.make_train_step) differentiates
``model.apply`` — XLA's autodiff then runs each sep+BN unit's backward as
~12 separate HBM passes (benchmarks/bench_bwd_entry.py). This module
re-expresses the SAME trunk computation as a function of the param tree,
routing every separable-conv + BatchNorm pair through
ops/fused_unit_bwd.sep_bn_unit (custom VJP with a single-pass Pallas
backward) while keeping the stem convs, residual 1x1 convs, max-pools and
their BatchNorms on plain XLA ops.

This mirrors the repo's established pattern for the fused *inference*
path (ops/fused_sepconv.trunk_features_fused): a functional twin of the
flax graph, parity-tested against it, spliced in by the trainer behind a
flag. Forward numerics are IDENTICAL to flax (same lax convs, same f32
BN-stats semantics — see test_fused_unit_bwd.TestCustomVjpVsFlax and
test_fused_train.py); gradients deviate only by the documented
more-precise f32 handling in ops/fused_unit_bwd.py.

STATUS: the Pallas unit backwards measured SLOWER than XLA autodiff at
every trunk geometry (tuning record in ops/fused_unit_bwd.py), so this
path stays opt-in (BISCUIT_FUSED_TRAIN=1) — on TPU its units fall back
to the 'reference' XLA composition unless PALLAS_BWD_HW lists a winning
spatial size. Production training uses the flax autodiff path.

Reference: the trunk itself is the Keras Xception of slideflow's trainer
(SURVEY.md §2.3 E4, /root/reference/biscuit/hp.py:3-24); architecture
layout in models/xception.py (the parity source for stage structure and
module naming).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.xception import ARCHS
from ..ops.fused_unit_bwd import sep_bn_unit

_MOMENTUM = 0.99  # flax nn.BatchNorm default, as used by models/xception.py
_EPS = 1e-5


def _bn_train(x, bn_params, bn_stats, updates, path):
    """Plain train-mode BatchNorm matching flax exactly (f32 stats,
    fast variance, bf16 out); records the running-stats update."""
    pf = x.astype(jnp.float32)
    mu = jnp.mean(pf, axis=(0, 1, 2))
    mu2 = jnp.mean(jnp.square(pf), axis=(0, 1, 2))
    var = jnp.maximum(0.0, mu2 - jnp.square(mu))
    inv = jax.lax.rsqrt(var + _EPS)
    gamma = jnp.asarray(bn_params["scale"], jnp.float32)
    beta = jnp.asarray(bn_params["bias"], jnp.float32)
    y = ((pf - mu) * (inv * gamma) + beta).astype(x.dtype)
    _record_stats(updates, path, bn_stats, mu, var)
    return y

def _record_stats(updates, path, bn_stats, mu, var):
    node = updates
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = {
        "mean": _MOMENTUM * jnp.asarray(bn_stats["mean"], jnp.float32)
        + (1.0 - _MOMENTUM) * mu,
        "var": _MOMENTUM * jnp.asarray(bn_stats["var"], jnp.float32)
        + (1.0 - _MOMENTUM) * var,
    }


def _unit(x, sep_params, bn_params, bn_stats, updates, path, relu_first,
          backend):
    """One separable-conv + BN unit through the fused custom-VJP op."""
    y, mu, var = sep_bn_unit(
        x,
        sep_params["depthwise"]["kernel"],
        sep_params["pointwise"]["kernel"],
        bn_params["scale"],
        bn_params["bias"],
        _EPS,
        relu_first,
        backend,
    )
    _record_stats(updates, path, bn_stats, mu, var)
    return y


def _conv(x, kernel, strides=(1, 1), padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel, x.dtype), strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _block(x, bp, bs, updates, name, n_units, strides, relu_first, backend):
    """XceptionBlock twin: units via the fused op, residual/pool on XLA."""
    if strides != 1 or "res_conv" in bp:
        res = _conv(x, bp["res_conv"]["kernel"], (strides, strides))
        res = _bn_train(res, bp["res_bn"], bs[name]["res_bn"], updates,
                        (name, "res_bn"))
    else:
        res = x
    h = x
    for i in range(n_units):
        h = _unit(h, bp[f"sep{i}"], bp[f"bn{i}"], bs[name][f"bn{i}"],
                  updates, (name, f"bn{i}"), relu_first or i > 0, backend)
    if strides != 1:
        import flax.linen as nn

        h = nn.max_pool(h, (3, 3), strides=(strides, strides),
                        padding="SAME")
    return h + res


def trunk_train_apply(
    arch: str,
    backbone_params: Dict[str, Any],
    backbone_stats: Dict[str, Any],
    x,
    backend: str = "auto",
) -> Tuple[Any, Dict[str, Any]]:
    """Train-mode trunk forward: tiles -> pooled f32 features.

    Returns (features, new_backbone_batch_stats). Gradients flow through
    the fused unit backwards; the running-stats updates are the standard
    momentum blend (not differentiated, as in flax's mutable collection).
    """
    cfg = ARCHS[arch]
    p, bs = backbone_params, backbone_stats
    updates: Dict[str, Any] = {}

    h = _conv(x, p["conv1"]["kernel"], (2, 2), "VALID")
    h = _bn_train(h, p["conv1_bn"], bs["conv1_bn"], updates, ("conv1_bn",))
    h = jax.nn.relu(h)
    h = _conv(h, p["conv2"]["kernel"], (1, 1), "VALID")
    h = _bn_train(h, p["conv2_bn"], bs["conv2_bn"], updates, ("conv2_bn",))
    h = jax.nn.relu(h)

    for i in range(len(cfg["entry_blocks"])):
        h = _block(h, p[f"entry{i}"], bs, updates, f"entry{i}", 2, 2,
                   relu_first=(i != 0), backend=backend)

    for i in range(cfg["middle_repeats"]):
        h = _block(h, p[f"middle{i}"], bs, updates, f"middle{i}", 3, 1,
                   relu_first=True, backend=backend)

    h = _block(h, p["exit_block"], bs, updates, "exit_block", 2, 2,
               relu_first=True, backend=backend)

    # Flax: sep0 -> bn0 -> relu -> sep1 -> bn1 -> relu. The inter-unit
    # relu is unit1's leading relu (fused in-kernel); only the final one
    # is explicit.
    for i in range(len(cfg["exit_convs"])):
        h = _unit(h, p[f"exit_sep{i}"], p[f"exit_bn{i}"], bs[f"exit_bn{i}"],
                  updates, (f"exit_bn{i}",), relu_first=(i != 0),
                  backend=backend)
    h = jax.nn.relu(h)

    feats = jnp.mean(h, axis=(1, 2)).astype(jnp.float32)
    return feats, updates


def fused_train_applicable(model, hp=None) -> bool:
    """The fused train trunk serves the Xception family in bf16 (the
    published config); resnet and f32 configs keep the flax path."""
    return (getattr(model, "arch", None) in ARCHS
            and getattr(model, "compute_dtype", None) == jnp.bfloat16)


def use_fused_train() -> bool:
    """Fused-backward train trunk gate: OPT-IN (BISCUIT_FUSED_TRAIN=1)
    until the Pallas unit backward is compile-proven and measured a win at
    every trunk geometry on a real chip (benchmarks/bench_unit_bwd.py is
    the gate; record in ops/fused_unit_bwd.py). On CPU the custom-VJP
    units run the 'reference' backend — same math, XLA ops. =0 forces the
    flax autodiff path."""
    import os

    return os.environ.get("BISCUIT_FUSED_TRAIN") == "1"
