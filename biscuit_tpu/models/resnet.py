"""ResNet-v1.5 backbones in Flax (NHWC, bf16 compute).

The reference stack's hyperparameter envelope selects the backbone by name
(slideflow ModelParams ``model=`` accepts the Keras application zoo —
'xception' is the published choice, hp.py:4, with 'resnet50' etc. as
supported alternatives). This module provides the ResNet-50/18 family so
the framework covers the model-selection surface, sharing the same pooled-
features + MLP-head contract as the Xception flagship (which keeps the
fast MC-dropout decomposition and the Pallas head kernel applicable to
every backbone).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

# name -> (block type, stage repeats, stem width)
RESNET_ARCHS = {
    "resnet50": ("bottleneck", (3, 4, 6, 3), 64),
    "resnet18": ("basic", (2, 2, 2, 2), 64),
    # Reduced preset for CPU tests / dry runs.
    "resnet_tiny": ("basic", (1, 1, 1, 1), 8),
}


class BottleneckBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        needs_proj = self.strides != 1 or x.shape[-1] != self.features * 4
        residual = x
        if needs_proj:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype,
                               name="proj")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype, name="proj_bn")(residual)
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(h)
        h = nn.relu(h)
        # v1.5: the stride lives on the 3x3 conv.
        h = nn.Conv(self.features, (3, 3),
                    strides=(self.strides, self.strides), use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         scale_init=nn.initializers.zeros, name="bn3")(h)
        return nn.relu(h + residual)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        needs_proj = self.strides != 1 or x.shape[-1] != self.features
        residual = x
        if needs_proj:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype,
                               name="proj")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype, name="proj_bn")(residual)
        h = nn.Conv(self.features, (3, 3),
                    strides=(self.strides, self.strides), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), use_bias=False, dtype=self.dtype,
                    name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         scale_init=nn.initializers.zeros, name="bn2")(h)
        return nn.relu(h + residual)


class ResNetBackbone(nn.Module):
    """Stem + 4 stages + global average pool -> f32 features."""

    arch: str = "resnet50"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_kind, repeats, stem = RESNET_ARCHS[self.arch]
        block_cls = BottleneckBlock if block_kind == "bottleneck" else BasicBlock
        x = nn.Conv(stem, (7, 7), strides=(2, 2), use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for stage, n_blocks in enumerate(repeats):
            feats = stem * (2 ** stage)
            for b in range(n_blocks):
                x = block_cls(
                    feats,
                    strides=(2 if (b == 0 and stage > 0) else 1),
                    dtype=self.dtype,
                    name=f"stage{stage}_block{b}",
                )(x, train)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


def resnet_feature_dim(arch: str) -> int:
    block_kind, repeats, stem = RESNET_ARCHS[arch]
    mult = 4 if block_kind == "bottleneck" else 1
    return stem * (2 ** (len(repeats) - 1)) * mult
