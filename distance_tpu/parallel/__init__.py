"""Multi-chip sharding of the pairwise sweep."""

from distance_tpu.parallel.mesh import (
    make_mesh,
    sharded_counters_fn,
    sharded_step,
)

__all__ = ["make_mesh", "sharded_counters_fn", "sharded_step"]
