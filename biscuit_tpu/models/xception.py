"""Xception tile classifier in Flax (TPU-first: NHWC, bf16 compute, f32
params/statistics).

The published model is slideflow's tf.keras Xception with
``include_top=False, pooling='avg'`` plus 2x1024-wide ReLU hidden layers
with dropout 0.1 and a 2-class softmax head
(/root/reference/biscuit/hp.py:3-24; SURVEY.md §2.3 E4). This is a
from-scratch Flax implementation of the Xception architecture (Chollet
2017): entry flow (2 convs + 3 separable-conv blocks with strided residuals),
middle flow (8 residual separable blocks at 728 channels), exit flow
(728->1024 block + 1536/2048 separable convs), global average pool.

Deliberate deviation from the reference stack: slideflow initializes from
ImageNet weights downloaded by Keras; this environment has no network
egress, so initialization is He-normal (documented; pass ``pretrained``
params to ``load_pretrained`` to restore converted weights from disk).

The dropout layers live only in the hidden head — this is what makes the
fast MC-dropout path possible: the convolutional trunk is deterministic at
inference, so K=30 stochastic passes only need to re-run the head
(see biscuit_tpu.train.uq and ops/mcd_head.py).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

# Architecture presets: (entry_convs, entry_blocks, middle_repeats,
# middle_width, exit_block, exit_convs)
ARCHS = {
    "xception": {
        "entry_convs": (32, 64),
        "entry_blocks": (128, 256, 728),
        "middle_repeats": 8,
        "middle_width": 728,
        "exit_block": (728, 1024),
        "exit_convs": (1536, 2048),
    },
    # Reduced variant for CPU tests and the multi-chip dry-run.
    "xception_tiny": {
        "entry_convs": (8, 16),
        "entry_blocks": (16, 32, 48),
        "middle_repeats": 2,
        "middle_width": 48,
        "exit_block": (48, 64),
        "exit_convs": (96, 128),
    },
}


class SeparableConv(nn.Module):
    """Depthwise 3x3 + pointwise 1x1, no bias (Keras SeparableConv2D)."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = nn.Conv(
            features=in_ch,
            kernel_size=(3, 3),
            feature_group_count=in_ch,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        x = nn.Conv(
            features=self.features,
            kernel_size=(1, 1),
            use_bias=False,
            dtype=self.dtype,
            name="pointwise",
        )(x)
        return x


class XceptionBlock(nn.Module):
    """Residual block of separable convs, optional strided maxpool exit."""

    features: Sequence[int]
    strides: int = 2
    relu_first: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        if self.strides != 1 or x.shape[-1] != self.features[-1]:
            residual = nn.Conv(
                self.features[-1], (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="res_conv",
            )(x)
            residual = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype,
                name="res_bn",
            )(residual)

        h = x
        for i, feat in enumerate(self.features):
            if i > 0 or self.relu_first:
                h = nn.relu(h)
            h = SeparableConv(feat, dtype=self.dtype, name=f"sep{i}")(h)
            h = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, name=f"bn{i}"
            )(h)
        if self.strides != 1:
            h = nn.max_pool(
                h, (3, 3), strides=(self.strides, self.strides), padding="SAME"
            )
        return h + residual


class XceptionBackbone(nn.Module):
    """Convolutional trunk -> pooled feature vector (include_top=False,
    pooling='avg')."""

    arch: str = "xception"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, stage: str = "all"):
        """``stage`` selects a sub-path so the fused middle-flow Pallas
        kernel (ops/fused_sepconv.py) can splice in between 'entry' and
        'exit': 'entry' returns the middle-flow input, 'middle' maps
        middle input -> middle output, 'exit' maps middle output ->
        pooled features. Module names are identical across stages, so one
        'all' param tree serves every stage at apply time."""
        cfg = ARCHS[self.arch]
        if stage in ("all", "entry", "stem"):
            # Entry flow: two strided/plain convs (the 'stem'). VALID
            # padding matches keras.applications Xception exactly (its
            # block1 convs use the Conv2D default padding='valid'; every
            # other conv in the graph is 'same') — required so converted
            # ImageNet weights reproduce the Keras features
            # (tests/test_pretrained.py numpy-forward parity).
            x = nn.Conv(cfg["entry_convs"][0], (3, 3), strides=(2, 2),
                        use_bias=False, padding="VALID", dtype=self.dtype,
                        name="conv1")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name="conv1_bn")(x)
            x = nn.relu(x)
            x = nn.Conv(cfg["entry_convs"][1], (3, 3), use_bias=False,
                        padding="VALID", dtype=self.dtype, name="conv2")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name="conv2_bn")(x)
            x = nn.relu(x)
            if stage == "stem":
                return x

            # Entry blocks (first block skips the leading ReLU, as in Keras).
            for i, feat in enumerate(cfg["entry_blocks"]):
                x = XceptionBlock(
                    (feat, feat), strides=2, relu_first=(i != 0),
                    dtype=self.dtype, name=f"entry{i}",
                )(x, train)
            if stage == "entry":
                return x

        if stage in ("all", "middle"):
            # Middle flow: residual triples at constant width.
            w = cfg["middle_width"]
            for i in range(cfg["middle_repeats"]):
                x = XceptionBlock(
                    (w, w, w), strides=1, dtype=self.dtype, name=f"middle{i}"
                )(x, train)
            if stage == "middle":
                return x

        # Exit flow ('exit_tail' enters after the strided exit block, for
        # the fused-block composition in ops/fused_sepconv.py).
        if stage != "exit_tail":
            x = XceptionBlock(
                cfg["exit_block"], strides=2,
                dtype=self.dtype, name="exit_block",
            )(x, train)
        for i, feat in enumerate(cfg["exit_convs"]):
            x = SeparableConv(feat, dtype=self.dtype, name=f"exit_sep{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name=f"exit_bn{i}")(x)
            x = nn.relu(x)

        # Global average pool -> f32 features.
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


class Head(nn.Module):
    """slideflow-style hidden head: N x Dense(width)+ReLU+Dropout, then a
    linear classifier. All the model's dropout lives here."""

    num_classes: int = 2
    hidden_layers: int = 2
    hidden_width: int = 1024
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False, mc_dropout: bool = False):
        h = feats.astype(self.dtype)
        use_dropout = train or mc_dropout
        for i in range(self.hidden_layers):
            h = nn.Dense(self.hidden_width, dtype=self.dtype,
                         name=f"hidden{i}")(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=not use_dropout,
                           name=f"dropout{i}")(h)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="logits")(h)


class XceptionClassifier(nn.Module):
    """Backbone + head. ``mc_dropout=True`` activates head dropout at
    inference (the MC-dropout posterior sampling of SURVEY.md §2.3 E5).

    setup-style so the UQ engine can apply ``features`` (deterministic
    trunk, once per tile) and ``head_logits`` (stochastic head, K times)
    as separate methods — the decomposition behind the fast MC-dropout
    path.
    """

    arch: str = "xception"
    num_classes: int = 2
    hidden_layers: int = 2
    hidden_width: int = 1024
    dropout: float = 0.1
    compute_dtype: Any = jnp.bfloat16

    def setup(self):
        if self.arch in ARCHS:
            self.backbone = XceptionBackbone(
                self.arch, dtype=self.compute_dtype
            )
        else:
            from .resnet import RESNET_ARCHS, ResNetBackbone

            if self.arch not in RESNET_ARCHS:
                raise ValueError(f"Unknown architecture {self.arch!r}")
            self.backbone = ResNetBackbone(
                self.arch, dtype=self.compute_dtype
            )
        self.head = Head(
            num_classes=self.num_classes,
            hidden_layers=self.hidden_layers,
            hidden_width=self.hidden_width,
            dropout=self.dropout,
        )

    def __call__(self, x, train: bool = False, mc_dropout: bool = False,
                 return_features: bool = False):
        feats = self.backbone(x, train)
        logits = self.head(feats, train=train, mc_dropout=mc_dropout)
        if return_features:
            return logits, feats
        return logits

    def features(self, x, train: bool = False):
        """Deterministic penultimate features (also feeds UMAP mosaics,
        SURVEY.md §2.3 E9)."""
        return self.backbone(x, train)

    def trunk_entry(self, x, train: bool = False):
        """Entry flow only: input tiles -> middle-flow input (Xception
        archs; used by ops/fused_sepconv.trunk_features_fused)."""
        return self.backbone(x, train, stage="entry")

    def trunk_stem(self, x, train: bool = False):
        """Entry convs only (conv1/conv2): tiles -> first entry-block
        input (fused-block composition seam)."""
        return self.backbone(x, train, stage="stem")

    def trunk_exit_tail(self, x, train: bool = False):
        """Exit sepconvs + pool only: exit-block output -> features
        (fused-block composition seam)."""
        return self.backbone(x, train, stage="exit_tail")

    def trunk_middle(self, x, train: bool = False):
        """Middle flow only (XLA path — the parity reference for the fused
        Pallas kernel)."""
        return self.backbone(x, train, stage="middle")

    def trunk_exit(self, x, train: bool = False):
        """Exit flow only: middle-flow output -> pooled features."""
        return self.backbone(x, train, stage="exit")

    def head_logits(self, feats, train: bool = False,
                    mc_dropout: bool = False):
        """Head-only forward over precomputed features."""
        return self.head(feats, train=train, mc_dropout=mc_dropout)


def available_models():
    """All registered backbone names (the hp.model selection surface)."""
    from .resnet import RESNET_ARCHS

    return sorted(ARCHS) + sorted(RESNET_ARCHS)


def build_model(hp) -> XceptionClassifier:
    """Model factory from a ModelParams (hp.model selects the backbone;
    unknown names fall back to the published 'xception')."""
    from .resnet import RESNET_ARCHS

    if hp.model in ARCHS or hp.model in RESNET_ARCHS:
        arch = hp.model
    else:
        from ..utils_log import log

        log.warning(
            f"Unknown model {hp.model!r}; falling back to 'xception'. "
            f"Registered backbones: {available_models()}"
        )
        arch = "xception"
    return XceptionClassifier(
        arch=arch,
        num_classes=2,
        hidden_layers=hp.hidden_layers,
        hidden_width=hp.hidden_layer_width,
        dropout=hp.dropout,
        compute_dtype=jnp.bfloat16 if hp.compute_dtype == "bfloat16"
        else jnp.float32,
    )


def feature_dim(hp) -> int:
    """Penultimate (backbone) feature width for the configured arch."""
    if hp.model in ARCHS:
        return ARCHS[hp.model]["exit_convs"][-1]
    from .resnet import RESNET_ARCHS, resnet_feature_dim

    if hp.model in RESNET_ARCHS:
        return resnet_feature_dim(hp.model)
    return ARCHS["xception"]["exit_convs"][-1]
