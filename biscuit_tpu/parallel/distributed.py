"""Multi-host (DCN) initialization and per-process data placement.

The reference has no distributed runtime at all (SURVEY.md §2.5/§5.8). The
TPU-native recipe for multi-host slices is the standard JAX one — no custom
transport layer: ``jax.distributed.initialize`` connects the hosts, a global
Mesh spans all devices, each host feeds its own shard of the tile stream,
and ``jax.make_array_from_process_local_data`` assembles the global batch;
XLA routes gradient reductions over ICI within a slice and DCN across
hosts.

Single-host (this environment) these helpers degrade to no-ops, so the same
training code runs anywhere.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ..utils_log import log


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Connect this host into a multi-host JAX runtime (no-op when JAX can
    auto-detect or when already single-process).

    The already-initialized check must NOT touch the backend:
    ``jax.process_count()`` would initialize XLA, after which
    ``jax.distributed.initialize`` refuses to run (caught by the real
    two-process run in tests/test_distributed.py)."""
    if jax.distributed.is_initialized():
        return
    if coordinator_address is None and num_processes is None:
        # Single-host or TPU-pod auto-detection handles it.
        try:
            jax.distributed.initialize()
        except Exception as e:  # single-host without cluster env vars
            log.debug(f"jax.distributed.initialize skipped: {e}")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_shard() -> tuple[int, int]:
    """(shard index, num shards) for the host data pipeline — feed these to
    TileBatcher(shard=..., num_shards=...)."""
    return jax.process_index(), jax.process_count()


def is_main() -> bool:
    """True on the process that owns shared-filesystem artifact writes
    (model dirs, CSVs, checkpoints). Trivially true single-process."""
    return jax.process_index() == 0


def mesh_spans_processes(mesh) -> bool:
    """True when the mesh places devices on more than one process — the
    condition for lockstep DCN training. A host-local mesh under a
    multi-process runtime (the per-host independent-training mode that
    parallel/scheduler.py points users to) is a single-host program: its
    training must NOT shard the data stream by process_index or funnel
    artifact writes to process 0."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


_BARRIER_SEQ = [0]


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Block until every process reaches this point (no-op single-process).

    Uses the coordination-service barrier (gRPC), NOT an XLA collective:
    it must be safe to call while other processes are minutes deep in a
    host-side section (e.g. main writing prediction CSVs), which would
    blow Gloo/NCCL per-op timeouts. Each call gets a unique barrier id;
    all processes must execute the same barrier() call sequence.
    """
    if jax.process_count() == 1:
        return
    from jax._src import distributed as _dist

    _BARRIER_SEQ[0] += 1
    _dist.global_state.client.wait_at_barrier(
        f"biscuit_{name}_{_BARRIER_SEQ[0]}", timeout_ms)


_KV_SEQ = [0]


def broadcast_from_main(name: str, value: Optional[str],
                        timeout_ms: int = 600_000) -> str:
    """Main publishes a string; every other process blocks until it
    arrives. Single-process: returns value unchanged. All processes must
    execute the same broadcast call sequence (an internal counter keys
    each exchange uniquely within the run)."""
    if jax.process_count() == 1:
        return value
    from jax._src import distributed as _dist

    _KV_SEQ[0] += 1
    key = f"biscuit_kv_{name}_{_KV_SEQ[0]}"
    client = _dist.global_state.client
    if is_main():
        client.key_value_set(key, value)
        return value
    return client.blocking_key_value_get(key, timeout_ms)


def try_claim(name: str) -> bool:
    """Atomically claim a work token across the process group; True on the
    single process whose claim landed first (trivially true
    single-process). Built on the coordination-service's atomic
    fetch-and-increment, so no two processes can both win a token.

    This is the cross-host work-queue primitive behind distributed fold
    scheduling (experiment.py run() under a multi-process runtime): each
    host claims (experiment, fold) tasks and trains them on its own
    devices. Names must be deterministic across processes; re-claiming a
    name within one coordination-service lifetime always loses, so callers
    namespace names with a per-run nonce (see Experiment.run)."""
    if jax.process_count() == 1:
        return True
    from jax._src import distributed as _dist

    return _dist.global_state.client.key_value_increment(
        f"biscuit_claim_{name}", 1) == 1


def exchange_ok(name: str, ok: bool, timeout_ms: int = 600_000) -> bool:
    """All-processes status exchange: every process reports ``ok``, blocks
    until all have reported, and receives the conjunction. Single-process:
    returns ok unchanged.

    Used at step boundaries of distributed fold scheduling so one host's
    training failure aborts the protocol consistently on EVERY host
    (instead of the healthy hosts hanging at the next barrier until
    timeout while the failed one has already raised)."""
    if jax.process_count() == 1:
        return ok
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    _KV_SEQ[0] += 1
    base = f"biscuit_ok_{name}_{_KV_SEQ[0]}"
    client.key_value_set(f"{base}_{jax.process_index()}", "1" if ok else "0")
    barrier(f"ok_{name}", timeout_ms)
    return all(
        client.blocking_key_value_get(f"{base}_{p}", timeout_ms) == "1"
        for p in range(jax.process_count())
    )


def exchange_values(name: str, value: str,
                    timeout_ms: int = 600_000) -> list:
    """All-processes value exchange: every process posts ``value`` (str),
    blocks until all have, and receives the per-process list (index p =
    process p's value). Single-process: ``[value]``.

    Complements :func:`exchange_ok` when the peers' payloads matter, not
    just the conjunction — e.g. distributed scoring exchanges
    wrote-a-shard flags so the shared-filesystem merge can check the shard
    count instead of trusting a (possibly attribute-cached) glob."""
    if jax.process_count() == 1:
        return [value]
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    _KV_SEQ[0] += 1
    base = f"biscuit_val_{name}_{_KV_SEQ[0]}"
    client.key_value_set(f"{base}_{jax.process_index()}", str(value))
    barrier(f"val_{name}", timeout_ms)
    return [
        client.blocking_key_value_get(f"{base}_{p}", timeout_ms)
        for p in range(jax.process_count())
    ]


def global_batch(local_batch: dict, mesh, axis: str = "data") -> dict:
    """Assemble a process-local host batch into global sharded arrays.

    Array leaves become jax.Arrays sharded along the mesh's data axis
    (each host contributes its local rows); non-array leaves pass through.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        if isinstance(x, np.ndarray):
            return jax.make_array_from_process_local_data(sharding, x)
        return x

    return {k: put(v) for k, v in local_batch.items()}
