"""Multi-chip layer: mesh helpers, data-parallel training, sharded
bucket tables, multi-table ensembles.

The reference has no distributed code at all — its only device
management is ``.cuda()`` placement (survey §2).  This package is the
TPU-idiomatic equivalent: ``jax.sharding.Mesh`` + ``shard_map`` with
XLA collectives over ICI (``psum``/``all_gather``) instead of any
NCCL-style backend.
"""

from nlsh_tpu.parallel.mesh import make_mesh  # noqa: F401
from nlsh_tpu.parallel.sharded_index import ShardedIndexer  # noqa: F401
from nlsh_tpu.parallel.multitable import MultiTableIndexer  # noqa: F401
