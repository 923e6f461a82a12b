"""Typed exception hierarchy for biscuit-tpu.

Parity target: /root/reference/biscuit/errors.py:1-26 (same class names and
inheritance so downstream `except` clauses written against the reference
continue to work).
"""


class MatchError(Exception):
    """Base class for model/eval discovery failures."""


class ModelNotFoundError(MatchError):
    """No model directory matched the requested label/outcome/kfold."""


class MultipleModelsFoundError(MatchError):
    """More than one model directory matched."""


class EvalError(Exception):
    """Evaluation could not be performed."""


class ThresholdError(Exception):
    """Uncertainty threshold could not be detected from cross-validation."""


class ROCFailedError(Exception):
    """ROC curve could not be generated (e.g. empty predictions)."""


class PredsContainNaNError(Exception):
    """Tile-level predictions contain NaNs."""
