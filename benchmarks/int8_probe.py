#!/usr/bin/env python
"""Mosaic int8 feasibility + byte-sensitivity probe (round 4).

Two questions gate an int8 serving layout:

1. **Legality**: does Mosaic lower an int8 VMEM block -> f32 upcast ->
   MXU dot with the serving kernels' dynamic-DMA block pattern, on the
   real chip?  (Interpret mode proves nothing — the 2-D norms BlockSpec
   only worked in interpret mode, round 2.)
2. **Byte sensitivity**: at the big-batch 10M operating point, does
   halving streamed bytes buy anything, or is the grouped engine still
   group-floor-bound?  Measured separately by re-running the campaign
   qbatch point with ``NLSH_CFG5C_DTYPE=f32`` (2x bf16's bytes): if
   qps_batch holds at f32, bytes don't bind and int8 buys only HBM
   footprint (still real: bf16@10M = 2.7 GB, int8 = 1.35 GB).

This script answers (1): a strided-block scoring kernel shaped like the
grouped engine's inner loop (dynamic block index from scalar prefetch,
(block_rows, 128) int8 block, upcast, dot against an f32 query panel),
checked bitwise against XLA on quantized data.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/int8_probe.py
"""

from __future__ import annotations

import functools
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)

    br, lane, nq = 128, 128, 8
    n_blocks = 64
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(n_blocks * br, lane)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    scale = np.abs(corpus).max() / 127.0
    corpus_q = np.clip(np.round(corpus / scale), -127, 127).astype(np.int8)
    # integer query panel: every product and partial sum is exactly
    # representable in f32 (|sum| <= 128*16*127 < 2^24), so a CORRECT
    # kernel matches XLA bitwise regardless of contraction order, while
    # a wrong-block read is a wildly different integer — the check is
    # immune to the summation-order noise a float panel would add
    queries = rng.integers(-16, 17, size=(nq, lane)).astype(np.float32)
    # probe a scrambled block order (the serving kernels' access pattern)
    block_ids = rng.permutation(n_blocks).astype(np.int32)

    def kernel(bids_ref, q_ref, data_ref, out_ref):
        blk = data_ref[...].astype(jnp.float32)  # int8 -> f32 upcast
        out_ref[...] = jax.lax.dot_general(
            q_ref[...], blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    grid = (n_blocks,)
    fn = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((nq, lane), lambda i, bids: (0, 0)),
                pl.BlockSpec(
                    (br, lane),
                    lambda i, bids: (pl.multiple_of(bids[i], 1), 0),
                ),
            ],
            out_specs=pl.BlockSpec((None, nq, br),
                                   lambda i, bids: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks, nq, br), jnp.float32),
        interpret=jax.default_backend() != "tpu",  # CPU smoke only
    )

    out = np.asarray(fn(jnp.asarray(block_ids), jnp.asarray(queries),
                        jnp.asarray(corpus_q)))

    # XLA reference on the SAME quantized data (bitwise target)
    ref = np.asarray(
        jnp.einsum(
            "qd,bkd->bqk",
            jnp.asarray(queries),
            jnp.asarray(corpus_q.reshape(n_blocks, br, lane)
                        )[jnp.asarray(block_ids)].astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    ok = np.array_equal(out, ref)
    print(f"int8 kernel bitwise vs XLA: {ok}")
    if not ok:
        diff = np.abs(out - ref)
        print(f"  max abs diff {diff.max()}, mismatches "
              f"{(diff > 0).sum()}/{diff.size}")
        sys.exit(1)

    # quantization fidelity: top-10 agreement, quantized vs exact
    # scores, on realistic unit-sphere queries (host math — this is a
    # property of the quantisation, not the kernel)
    fq = rng.normal(size=(256, lane)).astype(np.float32)
    fq /= np.linalg.norm(fq, axis=1, keepdims=True)
    exact = fq @ corpus.T
    quant = (fq @ corpus_q.astype(np.float32).T) * scale
    agree = []
    for i in range(fq.shape[0]):
        a = set(np.argsort(-exact[i])[:10])
        b = set(np.argsort(-quant[i])[:10])
        agree.append(len(a & b) / 10)
    print(f"int8 top-10 id agreement vs f32 (unit-sphere rows): "
          f"{np.mean(agree):.3f}")


if __name__ == "__main__":
    main()
