"""Independent validation of the Keras->Flax converter (VERDICT r2 item 6).

A pure-numpy forward of the tf.keras.applications Xception graph, written
from the published architecture (Chollet 2017; Keras layer semantics:
VALID stem convs, SAME everywhere else, BatchNormalization epsilon=1e-3 —
the Keras default, TF SAME padding arithmetic, 3x3/2 SAME maxpool) — NOT
from the Flax implementation. Random weights are generated under Keras
layer names/layouts, run through this numpy graph, then converted with
models/pretrained.py and run through the Flax model: outputs must agree to
1e-4. This fails if the layer map, a kernel layout transform, a padding
convention, or the BN-epsilon compensation is wrong in a way the
write-read roundtrip tests cannot see.
"""

from __future__ import annotations

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# Keras layer semantics in numpy
# ---------------------------------------------------------------------------

def _same_pad(size, k, s):
    out = -(-size // s)
    pad = max((out - 1) * s + k - size, 0)
    return pad // 2, pad - pad // 2


def _patches(x, kh, kw, stride):
    n, h, w, c = x.shape
    ho = (h - kh) // stride + 1
    wo = (w - kw) // stride + 1
    s = x.strides
    return np.lib.stride_tricks.as_strided(
        x, (n, ho, wo, kh, kw, c),
        (s[0], s[1] * stride, s[2] * stride, s[1], s[2], s[3]),
        writeable=False,
    )


def conv2d(x, kern, stride=1, padding="same"):
    kh, kw, _, _ = kern.shape
    if padding == "same":
        ph = _same_pad(x.shape[1], kh, stride)
        pw = _same_pad(x.shape[2], kw, stride)
        x = np.pad(x, ((0, 0), ph, pw, (0, 0)))
    p = _patches(x, kh, kw, stride)
    return np.einsum("nhwijc,ijco->nhwo", p, kern, optimize=True)


def depthwise2d(x, kern, stride=1):
    """Keras depthwise kernel layout (kh, kw, cin, depth_multiplier=1)."""
    kh, kw, _, _ = kern.shape
    ph = _same_pad(x.shape[1], kh, stride)
    pw = _same_pad(x.shape[2], kw, stride)
    x = np.pad(x, ((0, 0), ph, pw, (0, 0)))
    p = _patches(x, kh, kw, stride)
    return np.einsum("nhwijc,ijc->nhwc", p, kern[..., 0], optimize=True)


def batchnorm(x, g, b, mean, var, eps=1e-3):
    return (x - mean) / np.sqrt(var + eps) * g + b


def maxpool_3x3_s2_same(x):
    ph = _same_pad(x.shape[1], 3, 2)
    pw = _same_pad(x.shape[2], 3, 2)
    x = np.pad(x, ((0, 0), ph, pw, (0, 0)),
               constant_values=-np.inf)
    p = _patches(x, 3, 3, 2)
    return p.max(axis=(3, 4))


def relu(x):
    return np.maximum(x, 0.0)


# ---------------------------------------------------------------------------
# The Keras Xception graph (names per keras.applications creation order)
# ---------------------------------------------------------------------------

def _auto(i, base):
    """Keras's unnamed-layer naming: conv2d, conv2d_1, ... in creation
    order (the residual shortcut convs are the only unnamed weighted
    layers in the graph)."""
    return base if i == 0 else f"{base}_{i}"


def make_keras_weights(cfg, rng):
    """Random weights for every weighted layer, keyed by Keras layer name,
    shaped by walking the architecture config."""
    w = {}

    def conv(name, kh, kw, cin, cout):
        w[name] = {"kernel": rng.normal(
            0, 0.2 / np.sqrt(kh * kw * cin), (kh, kw, cin, cout)
        ).astype(np.float32)}

    def sepconv(name, cin, cout):
        w[name] = {
            "depthwise_kernel": rng.normal(
                0, 0.25, (3, 3, cin, 1)).astype(np.float32),
            "pointwise_kernel": rng.normal(
                0, 1.0 / np.sqrt(cin), (1, 1, cin, cout)).astype(np.float32),
        }

    def bn(name, c):
        w[name] = {
            "gamma": rng.uniform(0.6, 1.5, c).astype(np.float32),
            "beta": rng.normal(0, 0.2, c).astype(np.float32),
            "moving_mean": rng.normal(0, 0.2, c).astype(np.float32),
            # Includes low-variance channels — the regime where a wrong BN
            # epsilon shows up at the ~5% level.
            "moving_variance": rng.uniform(1e-4, 1.5, c).astype(np.float32),
        }

    c1, c2 = cfg["entry_convs"]
    conv("block1_conv1", 3, 3, 3, c1)
    bn("block1_conv1_bn", c1)
    conv("block1_conv2", 3, 3, c1, c2)
    bn("block1_conv2_bn", c2)

    cin = c2
    block, n_auto = 2, 0
    for feat in cfg["entry_blocks"]:
        conv(_auto(n_auto, "conv2d"), 1, 1, cin, feat)
        bn(_auto(n_auto, "batch_normalization"), feat)
        n_auto += 1
        sepconv(f"block{block}_sepconv1", cin, feat)
        bn(f"block{block}_sepconv1_bn", feat)
        sepconv(f"block{block}_sepconv2", feat, feat)
        bn(f"block{block}_sepconv2_bn", feat)
        cin = feat
        block += 1
    wmid = cfg["middle_width"]
    for _ in range(cfg["middle_repeats"]):
        for j in (1, 2, 3):
            sepconv(f"block{block}_sepconv{j}", wmid, wmid)
            bn(f"block{block}_sepconv{j}_bn", wmid)
        block += 1
    a, b = cfg["exit_block"]
    conv(_auto(n_auto, "conv2d"), 1, 1, cin, b)
    bn(_auto(n_auto, "batch_normalization"), b)
    sepconv(f"block{block}_sepconv1", cin, a)
    bn(f"block{block}_sepconv1_bn", a)
    sepconv(f"block{block}_sepconv2", a, b)
    bn(f"block{block}_sepconv2_bn", b)
    cin = b
    block += 1
    for j, feat in enumerate(cfg["exit_convs"], start=1):
        sepconv(f"block{block}_sepconv{j}", cin, feat)
        bn(f"block{block}_sepconv{j}_bn", feat)
        cin = feat
    return w


def xception_forward(x, w, cfg):
    """include_top=False, pooling='avg' forward, float32."""

    def bn_(h, name):
        a = w[name]
        return batchnorm(h, a["gamma"], a["beta"], a["moving_mean"],
                         a["moving_variance"])

    def sep_(h, name):
        a = w[name]
        return conv2d(depthwise2d(h, a["depthwise_kernel"]),
                      a["pointwise_kernel"])

    x = conv2d(x, w["block1_conv1"]["kernel"], stride=2, padding="valid")
    x = relu(bn_(x, "block1_conv1_bn"))
    x = conv2d(x, w["block1_conv2"]["kernel"], padding="valid")
    x = relu(bn_(x, "block1_conv2_bn"))

    block, n_auto = 2, 0
    for i, _feat in enumerate(cfg["entry_blocks"]):
        res = conv2d(x, w[_auto(n_auto, "conv2d")]["kernel"], stride=2)
        res = bn_(res, _auto(n_auto, "batch_normalization"))
        n_auto += 1
        h = x
        for j in (1, 2):
            if i > 0 or j > 1:  # block2 has no ReLU before sepconv1
                h = relu(h)
            h = bn_(sep_(h, f"block{block}_sepconv{j}"),
                    f"block{block}_sepconv{j}_bn")
        x = maxpool_3x3_s2_same(h) + res
        block += 1

    for _ in range(cfg["middle_repeats"]):
        h = x
        for j in (1, 2, 3):
            h = bn_(sep_(relu(h), f"block{block}_sepconv{j}"),
                    f"block{block}_sepconv{j}_bn")
        x = x + h
        block += 1

    res = conv2d(x, w[_auto(n_auto, "conv2d")]["kernel"], stride=2)
    res = bn_(res, _auto(n_auto, "batch_normalization"))
    h = x
    for j in (1, 2):
        h = bn_(sep_(relu(h), f"block{block}_sepconv{j}"),
                f"block{block}_sepconv{j}_bn")
    x = maxpool_3x3_s2_same(h) + res
    block += 1

    for j in (1, 2):
        x = relu(bn_(sep_(x, f"block{block}_sepconv{j}"),
                     f"block{block}_sepconv{j}_bn"))
    return x.mean(axis=(1, 2))


# ---------------------------------------------------------------------------
# Converter parity
# ---------------------------------------------------------------------------

def _write_npz(path, keras_dict):
    flat = {}
    for layer, arrays in keras_dict.items():
        for name, a in arrays.items():
            flat[f"{layer}/{name}"] = a
    np.savez(path, **flat)


@pytest.mark.parametrize(
    "arch,size",
    [("xception_tiny", 32), ("xception", 75)],
    ids=["tiny", "full"],
)
def test_converted_flax_matches_numpy_keras(arch, size, tmp_path):
    import jax

    from biscuit_tpu.models.pretrained import load_pretrained
    from biscuit_tpu.models.xception import ARCHS, XceptionClassifier
    from biscuit_tpu.train.trainer import init_model

    cfg = ARCHS[arch]
    rng = np.random.default_rng(7)
    w = make_keras_weights(cfg, rng)
    x = rng.uniform(-1, 1, (2, size, size, 3)).astype(np.float32)
    feats_np = xception_forward(x, w, cfg)

    path = str(tmp_path / "w.npz")
    _write_npz(path, w)

    class HP:
        model = arch
        tile_px = size
        hidden_layers = 1
        hidden_layer_width = 16
        dropout = 0.0
        compute_dtype = "float32"
        pretrained = None

    model = XceptionClassifier(arch=arch, num_classes=2, hidden_layers=1,
                               hidden_width=16, dropout=0.0,
                               compute_dtype=np.float32)
    params, stats = init_model(model, HP(), jax.random.PRNGKey(0))
    params, stats = load_pretrained(params, stats, path, arch=arch)
    feats_fx = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, x, train=False,
        method="features",
    ))
    assert feats_np.shape == feats_fx.shape
    # Full arch: 36 stacked BN/conv layers of float32 accumulate ~5e-4
    # reassociation noise (XLA vs numpy summation order); any layer-map,
    # layout, padding, or epsilon bug shows up orders of magnitude larger
    # (removing the BN-eps compensation alone shifts features by ~1e-1).
    tol = 2e-3 if arch == "xception" else 1e-4
    np.testing.assert_allclose(feats_fx, feats_np, rtol=tol, atol=tol)


def test_numpy_graph_spatial_dims():
    """The stem is VALID (Keras Conv2D default): 299 -> 149 -> 147, then
    SAME-strided blocks 74 -> 37 -> 19 -> 10 (the published geometry)."""
    sizes = []
    h = 299
    h = (h - 3) // 2 + 1
    sizes.append(h)          # conv1
    h = h - 2
    sizes.append(h)          # conv2
    for _ in range(4):       # 3 entry blocks + exit block
        h = -(-h // 2)
        sizes.append(h)
    assert sizes == [149, 147, 74, 37, 19, 10]
