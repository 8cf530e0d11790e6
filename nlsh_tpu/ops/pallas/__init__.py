"""Pallas TPU kernels for the serving hot path."""

from nlsh_tpu.ops.pallas.query_kernel import (  # noqa: F401
    bucket_scores,
    serving_layout,
    ServingLayout,
)
