"""In-run checkpointing and resume (SURVEY.md §5.3-5.4).

The reference's only fault-tolerance is filesystem-keyed fold resumption
(completed folds are skipped — experiment.py:799-807 et al.); a fold that
dies mid-training restarts from scratch. This module adds the TPU-native
layer SURVEY.md §5.4 calls for: periodic Orbax checkpoints *inside* a
training run, with automatic restore-and-continue.

Layout: ``{model_dir}/ckpt/{step}/`` managed by an Orbax
CheckpointManager (async save, keep latest 2). The trainer calls
``maybe_restore`` once at start and ``save`` every ``checkpoint_every``
steps; the final model save remains the flax-msgpack epoch dir (the
§2.4 contract).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

from ..utils_log import log


class RunCheckpointer:
    """Orbax-backed periodic checkpointing for one training run."""

    def __init__(self, model_dir: str, every: Optional[int] = None):
        self.every = every
        self.dir = os.path.join(os.path.abspath(model_dir), "ckpt")
        self._mngr = None
        if every:
            import orbax.checkpoint as ocp

            self._mngr = ocp.CheckpointManager(
                self.dir,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=2, enable_async_checkpointing=True
                ),
            )

    def maybe_restore(self, params, batch_stats, opt_state
                      ) -> Tuple[Any, Any, Any, int]:
        """Restore the latest checkpoint if present; returns state + step."""
        if self._mngr is None:
            return params, batch_stats, opt_state, 0
        latest = self._mngr.latest_step()
        if latest is None:
            return params, batch_stats, opt_state, 0
        import orbax.checkpoint as ocp

        target = {
            "params": params,
            "batch_stats": batch_stats,
            "opt_state": opt_state,
        }
        restored = self._mngr.restore(
            latest, args=ocp.args.StandardRestore(target)
        )
        log.info(f"Resumed training from checkpoint step {latest}")
        return (
            restored["params"],
            restored["batch_stats"],
            restored["opt_state"],
            int(latest),
        )

    def save(self, step: int, params, batch_stats, opt_state) -> None:
        if self._mngr is None or not self.every or step % self.every:
            return
        import orbax.checkpoint as ocp

        self._mngr.save(
            step,
            args=ocp.args.StandardSave(
                {
                    "params": params,
                    "batch_stats": batch_stats,
                    "opt_state": opt_state,
                }
            ),
        )

    def close(self) -> None:
        if self._mngr is not None:
            self._mngr.wait_until_finished()
            self._mngr.close()
