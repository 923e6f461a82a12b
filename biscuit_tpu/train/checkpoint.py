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

Multi-host (lockstep DCN) mode: the training state is REPLICATED across
processes (pinned bitwise by tests/test_distributed.py), so main's local
replica IS the global state — main materializes it to host numpy and
saves through a single-active-process Orbax manager
(``MultiprocessingOptions(active_processes={0})`` keeps Orbax's internal
barriers scoped to main alone; no collective I/O). On resume, main
broadcasts the restore step over the coordination-service KV store and
every process reads the SAME checkpoint files read-only — identical
restored state on every host, so the lockstep fleet cannot skew.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

from ..utils_log import log


def _to_host(tree):
    """Materialize a (possibly process-spanning, replicated) array tree to
    host numpy. For a replicated global array every process holds full
    copies — shard 0 of the local replica is the whole value."""
    import jax
    import numpy as np

    def conv(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)

    return jax.tree.map(conv, tree)


class RunCheckpointer:
    """Orbax-backed periodic checkpointing for one training run.

    Args:
        every: checkpoint every N steps (None disables).
        multihost: lockstep multi-process training — main saves alone,
            everyone restores read-only (see module docstring).
        is_main: whether this process owns the save path (always True
            single-host).
    """

    def __init__(self, model_dir: str, every: Optional[int] = None,
                 multihost: bool = False, is_main: bool = True):
        self.every = every
        self.multihost = multihost
        self.is_main = is_main
        self.dir = os.path.join(os.path.abspath(model_dir), "ckpt")
        self._mngr = None
        # Non-main multihost processes defer manager construction to
        # restore time: main's constructor creates the directory, and the
        # restore step arrives over the KV store only after that, so the
        # read-only manager never races the mkdir.
        if every and (is_main or not multihost):
            self._mngr = self._make_manager(read_only=False)

    def _make_manager(self, read_only: bool):
        import orbax.checkpoint as ocp

        kwargs: dict = dict(
            max_to_keep=2,
            enable_async_checkpointing=not read_only,
            read_only=read_only,
        )
        if self.multihost:
            import jax

            pid = jax.process_index()
            # Scope Orbax's internal barriers to THIS process alone: saves
            # happen on main only and restores are independent read-only
            # loads — a fleet-wide Orbax barrier would deadlock against
            # processes that never construct a manager.
            kwargs["multiprocessing_options"] = (
                ocp.options.MultiprocessingOptions(
                    primary_host=pid,
                    active_processes={pid},
                    barrier_sync_key_prefix=f"biscuit_ckpt_p{pid}",
                ))
            # Orbax rejects create=True alongside active_processes; the
            # directory is made here instead (main creates it before any
            # reader can learn a restore step exists — see __init__).
            kwargs["create"] = False
            if not read_only:
                os.makedirs(self.dir, exist_ok=True)
        return ocp.CheckpointManager(
            self.dir, options=ocp.CheckpointManagerOptions(**kwargs))

    def latest(self) -> Optional[int]:
        """Latest checkpointed step, or None (main/single-host only)."""
        return self._mngr.latest_step() if self._mngr is not None else None

    def maybe_restore(self, params, batch_stats, opt_state,
                      step: Optional[int] = None
                      ) -> Tuple[Any, Any, Any, int]:
        """Restore a checkpoint if present; returns state + restored step.

        ``step``: multihost non-main processes pass the step main
        broadcast (they cannot scan the directory race-free themselves);
        main/single-host leave it None to take the latest."""
        if not self.every:
            return params, batch_stats, opt_state, 0
        if step is None:
            step = self.latest()
        if step is None:
            return params, batch_stats, opt_state, 0
        import orbax.checkpoint as ocp

        if self._mngr is None:  # multihost non-main: read-only, lazily
            self._mngr = self._make_manager(read_only=True)
        # Restore to host numpy regardless of where the target tree lives
        # (multihost targets may be process-spanning): the train step's
        # replicated in_shardings accept host arrays on every process.
        target = _to_host(
            {"params": params, "batch_stats": batch_stats,
             "opt_state": opt_state})
        restored = self._mngr.restore(
            int(step), args=ocp.args.StandardRestore(target)
        )
        log.info(f"Resumed training from checkpoint step {step}")
        return (
            restored["params"],
            restored["batch_stats"],
            restored["opt_state"],
            int(step),
        )

    def save(self, step: int, params, batch_stats, opt_state,
             force: bool = False) -> None:
        """Save at checkpoint cadence; ``force=True`` saves regardless of
        cadence (preemption path). Forcing a step that is already saved
        (or mid-save) is a no-op."""
        if self._mngr is None or not self.every:
            return
        if not force and step % self.every:
            return
        if self.multihost and not self.is_main:
            return
        if force and (step % self.every == 0 or step in
                      self._mngr.all_steps()):
            return  # the cadence save already covers this step
        import orbax.checkpoint as ocp

        tree = {"params": params, "batch_stats": batch_stats,
                "opt_state": opt_state}
        if self.multihost:
            # Main's local replica is the global state; materializing it
            # here also hands the async writer host arrays it can hold
            # across steps safely.
            tree = _to_host(tree)
        self._mngr.save(step, args=ocp.args.StandardSave(tree))

    def wait(self) -> None:
        """Block until in-flight async saves are committed (preemption
        path: the process is about to exit)."""
        if self._mngr is not None:
            self._mngr.wait_until_finished()

    def close(self) -> None:
        if self._mngr is not None:
            self._mngr.wait_until_finished()
            self._mngr.close()
