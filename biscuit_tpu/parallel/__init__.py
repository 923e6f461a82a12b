"""Device-mesh parallelism: data-parallel sharding over ICI and the
experiment-level submesh scheduler (SURVEY.md §2.5)."""

from .mesh import (  # noqa: F401
    batch_sharding,
    data_parallel_mesh,
    replicated,
    shard_batch,
)
