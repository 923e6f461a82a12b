"""Compatibility alias: ``import biscuit`` -> biscuit_tpu.

BASELINE.json's north star preserves the reference's public API
(``biscuit.experiment``, ``biscuit.threshold.from_cv/apply``,
``biscuit.hp``, ``biscuit.utils``, ``biscuit.delong`` — reference
__init__.py:1-9), so code written against jamesdolezal/biscuit runs
unchanged against the TPU-native implementation:

    import biscuit
    from biscuit import threshold
    params = threshold.from_cv(dfs)
    biscuit.Experiment(project).run(...)
"""

import sys

import biscuit_tpu
from biscuit_tpu import delong, errors, hp, threshold, utils  # noqa: F401
from biscuit_tpu.experiment import Experiment  # noqa: F401
from biscuit_tpu import experiment  # noqa: F401
from biscuit_tpu.utils import find_cv, get_model_results  # noqa: F401

# Submodule imports like `from biscuit.threshold import from_cv` resolve to
# the biscuit_tpu modules.
for _name in ("threshold", "utils", "delong", "errors", "hp", "experiment"):
    sys.modules[f"{__name__}.{_name}"] = getattr(biscuit_tpu, _name)

__version__ = "1.0.1"  # reference parity (__init__.py:9)
__all__ = ["hp", "experiment", "utils", "errors", "delong", "threshold",
           "find_cv", "get_model_results", "Experiment"]
