"""biscuit-tpu: TPU-native whole-slide-image uncertainty quantification.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
jamesdolezal/biscuit (BISCUIT: Bayesian Inference of Slide-level Confidence
via Uncertainty Index Thresholding) plus the slideflow capability surface it
depends on (SURVEY.md §2.3), redesigned TPU-first.

Public API parity with /root/reference/biscuit/__init__.py:1-9 (hp,
experiment, utils, errors, delong, find_cv, get_model_results, Experiment),
plus the TPU-native subsystems: models, ops, data, train, parallel, project.
"""

from . import delong, errors, hp, threshold, utils  # noqa: F401
from .utils import find_cv, get_model_results  # noqa: F401

__version__ = "0.1.0"

_LAZY = {
    "experiment": ".experiment",
    "Experiment": ".experiment",
    "project": ".project",
    "Project": ".project",
    "models": ".models",
    "ops": ".ops",
    "data": ".data",
    "train": ".train",
    "parallel": ".parallel",
    "heatmap": ".heatmap",
    "Heatmap": ".heatmap",
    "serve": ".serve",
}


def __getattr__(name):
    """Lazy-load heavyweight submodules (jax/flax) so the pure-stats layer
    imports instantly on CPU-only analysis nodes."""
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name], __name__)
        if name in ("Experiment", "Project", "Heatmap"):
            return getattr(mod, name)
        return mod
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
