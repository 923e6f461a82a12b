"""Keras Xception -> Flax parameter converter (ImageNet initialization).

Parity: the published model is slideflow's tf.keras Xception initialized
from ImageNet weights (/root/reference/biscuit/hp.py:3-24 builds
``sf.model.ModelParams(model='xception')``; slideflow passes
``weights='imagenet'`` to ``tf.keras.applications.Xception``, which
downloads ``xception_weights_tf_dim_ordering_tf_kernels_notop.h5``).
Every published AUC presumes those pretrained trunk features at 1 epoch.
This environment has no network egress, so the weights must be *staged on
disk*; this module converts a staged Keras-layout weight file (``.h5`` as
written by ``Model.save_weights``, or an ``.npz`` with ``layer/weight``
keys) into the Flax parameter tree of ``models.xception.XceptionBackbone``.

Staging: place the Keras notop weights at
``$BISCUIT_PRETRAINED_DIR/xception_imagenet.h5`` (or ``.npz``) and set
``ModelParams(pretrained='imagenet')``, or pass an explicit path as
``ModelParams(pretrained='/path/to/weights.h5')``. Only the convolutional
trunk is loaded — the hidden head is always freshly initialized, matching
``include_top=False`` in the reference (hp.py:14).

Layer-name contract (tf.keras.applications.Xception, Keras >= 2.4):
  - named layers: ``block1_conv{1,2}[_bn]``, ``block{2..4}_sepconv{1,2}[_bn]``,
    ``block{5..12}_sepconv{1,2,3}[_bn]``, ``block13_sepconv{1,2}[_bn]``,
    ``block14_sepconv{1,2}[_bn]``
  - the four residual-shortcut convs are UNNAMED in the Keras source, so
    they carry auto-generated names in creation order: ``conv2d``,
    ``conv2d_1``, ``conv2d_2`` (entry blocks 2-4) and ``conv2d_3``
    (block 13), with matching ``batch_normalization[_N]`` layers.

Array layout conversions (Keras -> Flax):
  - Conv2D kernel (H, W, I, O) -> nn.Conv kernel (H, W, I, O): unchanged.
  - SeparableConv2D depthwise_kernel (H, W, I, 1) -> grouped nn.Conv kernel
    (H, W, 1, I): transpose last two axes.
  - SeparableConv2D pointwise_kernel (1, 1, I, O): unchanged.
  - BatchNormalization gamma/beta/moving_mean/moving_variance ->
    scale/bias (params) and mean/var (batch_stats).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax.core import freeze, unfreeze

from .xception import ARCHS

# Weight kinds: how a Keras layer's arrays map onto Flax leaves.
_CONV = "conv"        # kernel -> kernel
_SEP = "sepconv"      # depthwise_kernel/pointwise_kernel -> two sub-convs
_BN = "bn"            # gamma/beta -> params, moving_* -> batch_stats

# Keras Xception builds BatchNormalization(epsilon=1e-3); our flax model
# uses nn.BatchNorm's default 1e-5. Compensated at conversion time (see
# convert_keras_xception) — exact for inference because only var+eps enters
# the normalization.
_KERAS_BN_EPS = 1e-3
_FLAX_BN_EPS = 1e-5


def keras_layer_map(arch: str = "xception") -> Dict[Tuple[str, ...], Tuple[str, str]]:
    """Flax backbone module path -> (keras_layer_name, kind).

    Generated from the same ARCHS config the Flax model is built from, so
    the tiny test arch exercises the identical mapping code. For the real
    'xception' arch the emitted names are exactly the 80 weighted layers
    of ``tf.keras.applications.Xception`` (40 conv/sepconv + 40 batchnorm;
    the model's other 54 layers — ReLU/Add/Pool/Input — carry no weights).
    """
    if arch not in ARCHS:
        raise ValueError(
            f"Pretrained Keras weights are only defined for Xception archs "
            f"({sorted(ARCHS)}), not {arch!r}"
        )
    cfg = ARCHS[arch]
    m: Dict[Tuple[str, ...], Tuple[str, str]] = {
        ("conv1",): ("block1_conv1", _CONV),
        ("conv1_bn",): ("block1_conv1_bn", _BN),
        ("conv2",): ("block1_conv2", _CONV),
        ("conv2_bn",): ("block1_conv2_bn", _BN),
    }

    def auto(i: int, base: str) -> str:
        return base if i == 0 else f"{base}_{i}"

    n_auto = 0  # creation-order counter for the unnamed shortcut convs
    block = 2
    for i in range(len(cfg["entry_blocks"])):
        for j in range(2):
            m[(f"entry{i}", f"sep{j}")] = (f"block{block}_sepconv{j + 1}", _SEP)
            m[(f"entry{i}", f"bn{j}")] = (f"block{block}_sepconv{j + 1}_bn", _BN)
        m[(f"entry{i}", "res_conv")] = (auto(n_auto, "conv2d"), _CONV)
        m[(f"entry{i}", "res_bn")] = (auto(n_auto, "batch_normalization"), _BN)
        n_auto += 1
        block += 1
    for i in range(cfg["middle_repeats"]):
        for j in range(3):
            m[(f"middle{i}", f"sep{j}")] = (f"block{block}_sepconv{j + 1}", _SEP)
            m[(f"middle{i}", f"bn{j}")] = (f"block{block}_sepconv{j + 1}_bn", _BN)
        block += 1
    for j in range(2):
        m[("exit_block", f"sep{j}")] = (f"block{block}_sepconv{j + 1}", _SEP)
        m[("exit_block", f"bn{j}")] = (f"block{block}_sepconv{j + 1}_bn", _BN)
    m[("exit_block", "res_conv")] = (auto(n_auto, "conv2d"), _CONV)
    m[("exit_block", "res_bn")] = (auto(n_auto, "batch_normalization"), _BN)
    block += 1
    for j in range(2):
        m[(f"exit_sep{j}",)] = (f"block{block}_sepconv{j + 1}", _SEP)
        m[(f"exit_bn{j}",)] = (f"block{block}_sepconv{j + 1}_bn", _BN)
    return m


def _strip(name) -> str:
    """'block1_conv1/kernel:0' -> 'kernel' (last path part, no ':0')."""
    if isinstance(name, bytes):
        name = name.decode()
    return name.split("/")[-1].split(":")[0]


def _natural_key(name):
    """Sort key treating digit runs numerically: dense_2 < dense_10."""
    import re

    if isinstance(name, bytes):
        name = name.decode()
    return [int(p) if p.isdigit() else p for p in re.split(r"(\d+)", name)]


def read_keras_weights(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Read a Keras-layout weight file into {layer: {weight: array}}.

    Supports the HDF5 layout written by ``Model.save_weights`` (root or
    ``model_weights/`` group with per-layer groups and a ``weight_names``
    attr) and a flat ``.npz`` with ``'<layer>/<weight>'`` keys.
    """
    if path.endswith(".npz"):
        out: Dict[str, Dict[str, np.ndarray]] = {}
        with np.load(path) as z:
            for key in z.files:
                layer, _, weight = key.partition("/")
                out.setdefault(layer, {})[_strip(weight)] = z[key]
        return out

    import h5py  # environment-provided; only needed for .h5 staging

    out = {}
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        names = root.attrs.get("layer_names", None)
        if names is None:
            # No layer_names attr: h5py yields keys in ALPHABETICAL order,
            # where Keras auto-names break graph order ('dense_10' sorts
            # before 'dense_2') — with >=10 equal-width hidden layers the
            # structural Dense matching in convert_keras_head would then
            # load weights sideways with every shape still validating.
            # Natural-sort (split trailing index) restores graph order for
            # auto-named layers.
            names = sorted(root.keys(), key=_natural_key)
        layer_names = [
            n.decode() if isinstance(n, bytes) else n for n in names
        ]
        for layer in layer_names:
            g = root[layer]
            weight_names = g.attrs.get("weight_names", None)
            if weight_names is None:  # fall back to walking the group
                weight_names = []
                g.visit(lambda n: weight_names.append(n)
                        if isinstance(g[n], h5py.Dataset) else None)
            arrays = {}
            for wn in weight_names:
                wn_s = wn.decode() if isinstance(wn, bytes) else wn
                arrays[_strip(wn_s)] = np.asarray(g[wn_s])
            if arrays:
                out[layer] = arrays
    return out


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree, path, value):
    for p in path[:-1]:
        tree = tree.setdefault(p, {})
    tree[path[-1]] = value


def _take(layer_arrays: dict, keras_name: str, *keys: str) -> list:
    got = []
    for k in keys:
        if k not in layer_arrays:
            raise ValueError(
                f"Keras layer '{keras_name}' is missing weight '{k}' "
                f"(has {sorted(layer_arrays)})"
            )
        got.append(np.asarray(layer_arrays[k]))
    return got


def convert_keras_xception(
    keras_weights: Dict[str, Dict[str, np.ndarray]],
    params,
    batch_stats,
    arch: str = "xception",
):
    """Map Keras Xception weights onto (params, batch_stats) Flax trees.

    ``params``/``batch_stats`` are the freshly initialized trees from
    ``trainer.init_model`` — used as shape/dtype templates. Only
    ``params['backbone']`` / ``batch_stats['backbone']`` are replaced; the
    head stays at its fresh initialization (include_top=False parity).
    Raises ValueError on any missing layer or shape mismatch.
    """
    params = unfreeze(params)
    batch_stats = unfreeze(batch_stats)
    bb_params = params["backbone"]
    bb_stats = batch_stats["backbone"]
    problems = []

    for flax_path, (keras_name, kind) in keras_layer_map(arch).items():
        if keras_name not in keras_weights:
            problems.append(f"missing Keras layer '{keras_name}' "
                            f"(for backbone/{'/'.join(flax_path)})")
            continue
        arrays = keras_weights[keras_name]
        try:
            if kind == _CONV:
                (kernel,) = _take(arrays, keras_name, "kernel")
                _assign(bb_params, flax_path + ("kernel",), kernel, problems,
                        keras_name)
            elif kind == _SEP:
                dw, pw = _take(arrays, keras_name,
                               "depthwise_kernel", "pointwise_kernel")
                # (H, W, I, 1) -> (H, W, 1, I): grouped-conv layout.
                _assign(bb_params, flax_path + ("depthwise", "kernel"),
                        dw.transpose(0, 1, 3, 2), problems, keras_name)
                _assign(bb_params, flax_path + ("pointwise", "kernel"),
                        pw, problems, keras_name)
            else:  # _BN
                gamma, beta, mean, var = _take(
                    arrays, keras_name,
                    "gamma", "beta", "moving_mean", "moving_variance")
                _assign(bb_params, flax_path + ("scale",), gamma, problems,
                        keras_name)
                _assign(bb_params, flax_path + ("bias",), beta, problems,
                        keras_name)
                _assign(bb_stats, flax_path + ("mean",), mean, problems,
                        keras_name)
                # Keras Xception BN uses epsilon=1e-3; flax nn.BatchNorm
                # (and ops.fold_bn) normalize with epsilon=1e-5. Shift the
                # stored variance so x/sqrt(var' + 1e-5) == the Keras
                # x/sqrt(var + 1e-3) exactly in inference mode (ADVICE r2
                # medium finding; without this every BN layer is off by up
                # to ~5% scale on low-variance channels).
                _assign(bb_stats, flax_path + ("var",),
                        var + (_KERAS_BN_EPS - _FLAX_BN_EPS), problems,
                        keras_name)
        except ValueError as e:
            problems.append(str(e))

    if problems:
        raise ValueError(
            "Keras->Flax conversion failed "
            f"({len(problems)} problems):\n  " + "\n  ".join(problems)
        )
    return freeze(params), freeze(batch_stats)


def _assign(tree, path, array, problems, keras_name):
    try:
        template = _get(tree, path)
    except KeyError:
        problems.append(
            f"Flax tree has no leaf {'/'.join(path)} (from '{keras_name}')")
        return
    if tuple(template.shape) != tuple(array.shape):
        problems.append(
            f"shape mismatch at {'/'.join(path)} (from '{keras_name}'): "
            f"Flax {tuple(template.shape)} vs Keras {tuple(array.shape)}")
        return
    _set(tree, path, jnp.asarray(array, dtype=template.dtype))


def resolve_pretrained_path(spec: str) -> str:
    """'imagenet' -> staged file under $BISCUIT_PRETRAINED_DIR (default
    ~/.biscuit/pretrained); anything else is taken as an explicit path."""
    if spec != "imagenet":
        if not os.path.exists(spec):
            raise FileNotFoundError(f"Pretrained weight file not found: {spec}")
        return spec
    stage_dir = os.environ.get(
        "BISCUIT_PRETRAINED_DIR",
        os.path.join(os.path.expanduser("~"), ".biscuit", "pretrained"),
    )
    for ext in ("h5", "npz"):
        p = os.path.join(stage_dir, f"xception_imagenet.{ext}")
        if os.path.exists(p):
            return p
    raise FileNotFoundError(
        "pretrained='imagenet' but no staged weights found. Download the "
        "Keras notop Xception weights on a machine with egress and stage "
        f"them at {stage_dir}/xception_imagenet.h5 (see README)."
    )


def load_pretrained(params, batch_stats, path: str, arch: str = "xception"):
    """Convenience wrapper: read a staged Keras weight file and graft it
    onto freshly initialized (params, batch_stats) trees."""
    return convert_keras_xception(
        read_keras_weights(path), params, batch_stats, arch=arch
    )


def convert_keras_head(keras_weights: Dict[str, Dict[str, np.ndarray]],
                       params):
    """Map the Dense head of a FULL Keras model export onto
    ``params['head']`` (``hidden{i}`` + ``logits``).

    The published pretrained model (the reference README points to
    huggingface.co/jamesdolezal/lung-adeno-squam-v1) is a slideflow
    tf.keras model: the Xception trunk plus Dense hidden layers and a
    Dense logits layer. slideflow's head layer NAMES are
    version-dependent (unnamed Dense layers get Keras auto-names like
    ``dense``/``dense_1``), so matching is STRUCTURAL: the file's Dense
    layers — exactly a 2-D ``kernel`` plus ``bias`` — are taken in file
    order (``Model.save_weights``/the README export snippet both preserve
    graph order) as ``hidden0..hiddenN-1`` then ``logits``, every shape
    validated against the freshly initialized templates, so a
    wrong-width or wrong-count export fails loudly instead of loading
    sideways.
    """
    dense = [
        (name, arrays) for name, arrays in keras_weights.items()
        if {"kernel", "bias"} <= set(arrays)
        and np.asarray(arrays["kernel"]).ndim == 2
    ]
    params = unfreeze(params)
    head = params["head"]
    want = [f"hidden{i}" for i in range(len(head) - 1)] + ["logits"]
    if sorted(head) != sorted(want):
        raise ValueError(f"unexpected head modules {sorted(head)} "
                         f"(expected {want})")
    if len(dense) != len(want):
        raise ValueError(
            f"full-model export has {len(dense)} Dense layers "
            f"({[n for n, _ in dense]}) but the head needs {len(want)} "
            f"({want}); check hidden_layers/--hidden-width against the "
            "exported model")
    problems: list = []
    for flax_name, (keras_name, arrays) in zip(want, dense):
        kernel, bias = _take(arrays, keras_name, "kernel", "bias")
        _assign(head, (flax_name, "kernel"), kernel, problems, keras_name)
        _assign(head, (flax_name, "bias"), bias, problems, keras_name)
    if problems:
        raise ValueError(
            "Keras->Flax head conversion failed "
            f"({len(problems)} problems):\n  " + "\n  ".join(problems))
    return freeze(params)


def load_pretrained_full(params, batch_stats, path: str,
                         arch: str = "xception"):
    """Graft a FULL model export (trunk + hidden head + logits) onto
    freshly initialized trees: the switchover path for reference users
    bringing the published trained model (or any slideflow lung model)
    to TPU serving. See :func:`convert_keras_head` for the head-matching
    contract; the trunk follows the ImageNet converter exactly."""
    kw = read_keras_weights(path)
    params, batch_stats = convert_keras_xception(
        kw, params, batch_stats, arch=arch)
    params = convert_keras_head(kw, params)
    return params, batch_stats
