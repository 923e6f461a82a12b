"""Model hyperparameters, including the published Nature-2022 configuration.

Parity target: /root/reference/biscuit/hp.py:3-24, which builds a
``slideflow.model.ModelParams``. Here ``ModelParams`` is a native dataclass
with the same field names; the canonical instance ``nature2022`` matches the
published values exactly (Xception, 299px/302um, batch 128, dropout 0.1,
Adam 1e-4 with 0.98/512 exponential decay, 2x1024 hidden layers, 'xyrjb'
augmentation, reinhard_fast normalizer).
"""

from __future__ import annotations

import dataclasses
import json
from typing import List, Optional, Union


@dataclasses.dataclass
class ModelParams:
    """Hyperparameter envelope for tile-classifier training.

    Field names mirror the reference's slideflow ModelParams kwargs so
    experiment code is drop-in compatible.
    """

    model: str = "xception"
    tile_px: int = 299
    tile_um: Union[int, str] = 302
    batch_size: int = 128
    epochs: List[int] = dataclasses.field(default_factory=lambda: [1])
    early_stop: bool = True
    early_stop_method: str = "accuracy"
    # Patience is measured in EPOCHS (slideflow semantics): early stopping
    # cannot trigger before `early_stop_patience` epochs have elapsed.
    # 0 (the published value) means no floor — NOT "never stop".
    early_stop_patience: int = 0
    # Mid-training validation is smoothed with an exponential moving average
    # before the early-stop comparison (slideflow defaults): the EMA
    # initializes after `ema_observations` checks and early stop triggers
    # when the smoothed metric worsens.
    ema_observations: int = 20
    ema_smoothing: int = 2
    dropout: float = 0.1
    uq: bool = False
    hidden_layer_width: int = 1024
    hidden_layers: int = 2
    optimizer: str = "Adam"
    learning_rate: float = 1e-4
    learning_rate_decay_steps: int = 512
    learning_rate_decay: float = 0.98
    loss: str = "sparse_categorical_crossentropy"
    normalizer: Optional[str] = "reinhard_fast"
    include_top: bool = False
    pooling: str = "avg"
    augment: str = "xyrjb"
    # ImageNet-parity initialization: None = He-normal (documented
    # deviation), 'imagenet' = staged Keras notop weights resolved via
    # $BISCUIT_PRETRAINED_DIR, or an explicit weight-file path. The
    # reference gets this implicitly from Keras (hp.py:3-24).
    pretrained: Optional[str] = None
    # TPU-native additions (no reference counterpart):
    uq_samples: int = 30          # K MC-dropout passes (BASELINE.json configs[2])
    compute_dtype: str = "bfloat16"
    width: float = 1.0            # backbone width multiplier (1.0 = Xception)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @classmethod
    def from_dict(cls, d: dict) -> "ModelParams":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def copy(self) -> "ModelParams":
        return dataclasses.replace(
            self, epochs=list(self.epochs)
        )


def nature2022_params() -> ModelParams:
    """Fresh copy of the exact published configuration (reference hp.py:3-24)."""
    return ModelParams(
        model="xception",
        tile_px=299,
        tile_um=302,
        batch_size=128,
        epochs=[1],
        early_stop=True,
        early_stop_method="accuracy",
        dropout=0.1,
        uq=False,
        hidden_layer_width=1024,
        optimizer="Adam",
        learning_rate=0.0001,
        learning_rate_decay_steps=512,
        learning_rate_decay=0.98,
        loss="sparse_categorical_crossentropy",
        normalizer="reinhard_fast",
        include_top=False,
        hidden_layers=2,
        pooling="avg",
        augment="xyrjb",
    )


# The reference exposes `hp.nature2022` as a module-level *instance* that
# experiment steps mutate in place (experiment.py:786,797,821,848-849); we
# keep that contract. Experiment.run() copies it before mutating to avoid
# the cross-experiment mutation hazard baked into the reference design.
nature2022 = nature2022_params()
