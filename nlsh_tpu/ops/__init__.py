"""Pure-functional numeric kernels (jnp/lax only, all jittable)."""

from nlsh_tpu.ops import distances, code_distances, packing, knn  # noqa: F401
