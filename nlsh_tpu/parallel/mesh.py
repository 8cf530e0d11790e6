"""Device-mesh helpers.

One place decides how chips are arranged; everything else takes a
``Mesh`` and axis names.  Replaces the reference's ``.cuda()`` placement
(``hashings.py:37``, ``trainers/base.py:44-46``) as the "where does
compute live" layer.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices.

    Axis naming conventions used across the package:
      * ``"data"``  — batch sharding for data-parallel training,
      * ``"shard"`` — corpus/bucket-table sharding for the index,
      * ``"table"`` — multi-table ensemble sharding.
    The same physical mesh can be constructed under any name.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices but only {len(devices)} available"
        )
    return Mesh(np.asarray(devices[:n_devices]), (axis,))
