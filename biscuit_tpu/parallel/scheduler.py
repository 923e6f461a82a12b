"""Experiment-level parallelism: map independent trainings onto device
submeshes (SURVEY.md §2.5).

The published study is embarrassingly parallel above the model level: 23
dataset sizes x 3 folds x {CV, UQ, 15 nested, FULL} ~ 1000 independent
trainings (experiment.py:21-45, 753-922; "~1000 models" README.md:127). The
reference ran these sequentially per GPU across a fleet; here a
SubmeshScheduler partitions one TPU slice into disjoint submeshes (e.g. a
v5e-8 into 4 x 2-chip meshes) and dispatches trainings onto them from a
thread pool — XLA executes per-device streams concurrently, so independent
submeshes overlap fully.
"""

from __future__ import annotations

import queue
import threading
import traceback
from typing import Callable, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..utils_log import log


def partition_submeshes(n_submeshes: int,
                        devices: Optional[Sequence] = None,
                        axis: str = "data") -> List[Mesh]:
    """Split the device list into n disjoint 1-D meshes."""
    if devices is None:
        devices = jax.devices()
    if n_submeshes > len(devices):
        raise ValueError(
            f"Cannot build {n_submeshes} submeshes from {len(devices)} devices"
        )
    per = len(devices) // n_submeshes
    return [
        Mesh(np.asarray(devices[i * per:(i + 1) * per]), (axis,))
        for i in range(n_submeshes)
    ]


class SubmeshScheduler:
    """Run independent tasks concurrently, one worker thread per submesh.

    Each task is ``fn(mesh) -> result``; the scheduler threads the submesh
    through so trainers shard onto their assigned devices. Exceptions are
    collected, not raised mid-run.
    """

    def __init__(self, n_submeshes: Optional[int] = None,
                 devices: Optional[Sequence] = None):
        if jax.process_count() > 1 and devices is None:
            # Submesh concurrency and multi-host DP are mutually exclusive
            # per training: a submesh spanning only part of each host's
            # devices would need every process to co-execute every task,
            # defeating the scheduler's independent-task model. Run one
            # process per host with its LOCAL devices instead (pass
            # devices=jax.local_devices()), or drop n_submeshes.
            raise ValueError(
                "SubmeshScheduler over the global device set is "
                "unsupported under a multi-process runtime; pass "
                "devices=jax.local_devices() to schedule within this host")
        if devices is None:
            devices = jax.devices()
        if n_submeshes is None:
            n_submeshes = len(devices)
        self.meshes = partition_submeshes(n_submeshes, devices)

    def run(self, tasks: Sequence[Callable[[Mesh], object]]):
        """Execute all tasks; returns results in task order (exceptions are
        returned in place of results)."""
        results = [None] * len(tasks)
        q: "queue.Queue[int]" = queue.Queue()
        for i in range(len(tasks)):
            q.put(i)

        def worker(mesh: Mesh):
            while True:
                try:
                    i = q.get_nowait()
                except queue.Empty:
                    return
                try:
                    results[i] = tasks[i](mesh)
                except Exception as e:  # collected, not fatal
                    log.error(f"Submesh task {i} failed: {e}")
                    traceback.print_exc()
                    results[i] = e

        threads = [
            threading.Thread(target=worker, args=(m,), daemon=True)
            for m in self.meshes
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return results
