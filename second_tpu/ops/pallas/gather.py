"""Pallas TPU kernel: wide row gather via asynchronous HBM→VMEM DMA.

The sparse middle is gather-bound: XLA lowers `src[idx]` row gathers to a
serialized per-row loop that sustains ~50-95 GB/s on TPU vs ~820 GB/s HBM
peak (measured, `scripts/bench_gather_micro.py`) — it is the dominant cost
of every sparse-conv apply (`ops/sparse_conv.py:flat_rows`, the role of the
reference's scatter/gather inside spconv's CUDA rulebook apply,
`middle.py:429-509`). This kernel issues the row copies as *explicit
overlapped DMAs*: each grid tile first DMAs its index block HBM→SMEM, then
keeps `inflight` row DMAs in the air writing straight into the pipelined
VMEM output block — the DMA engines, not a gather loop, move the bytes.
(Indices are NOT scalar-prefetched: the hot call sites gather ~1.5M rows
per conv and SMEM cannot hold the full index vector.)

Activation: `SECOND_TPU_PALLAS_GATHER=1` reroutes `flat_rows` here (TPU
backends only). Correctness is pinned by interpret-mode tests against the
XLA gather (`tests/test_ops_jax.py`); flip the flag after benching on a
runtime whose Pallas path works (the current axon tunnel hangs on remote
Pallas compiles — see NOTES.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(T: int, inflight: int, idx_hbm, src_ref, out_ref,
                   idx_smem, idx_sem, sems):
    t = pl.program_id(0)
    # stage this tile's T indices into SMEM first (one descriptor)
    pltpu.make_async_copy(idx_hbm.at[pl.ds(t * T, T)], idx_smem,
                          idx_sem).start()
    pltpu.make_async_copy(idx_hbm.at[pl.ds(t * T, T)], idx_smem,
                          idx_sem).wait()

    def dma(r):
        return pltpu.make_async_copy(
            src_ref.at[idx_smem[r]], out_ref.at[r], sems.at[r % inflight])

    # rolling window: keep `inflight` row copies outstanding (statically
    # unrolled — T descriptor pairs, no data-dependent control flow)
    for r in range(T):
        if r >= inflight:
            dma(r - inflight).wait()
        dma(r).start()
    for r in range(max(0, T - inflight), T):
        dma(r).wait()


@functools.partial(jax.jit,
                   static_argnames=("rows_per_tile", "inflight", "interpret"))
def gather_rows_pallas(src, idx, *, rows_per_tile: int = 128,
                       inflight: int = 16, interpret: bool = False):
    """out[m] = src[idx[m]] — DMA-engine row gather.

    src: [R, W] (any dtype); idx: [M] int32, entries pre-clamped to [0, R).
    Returns [M, W]. M is padded internally to a tile multiple.
    """
    R, W = src.shape
    M = idx.shape[0]
    T = min(rows_per_tile, max(1, M))
    Mp = -(-M // T) * T
    idx_p = jnp.zeros((Mp,), jnp.int32).at[:M].set(idx.astype(jnp.int32))

    out = pl.pallas_call(
        functools.partial(_gather_kernel, T, min(inflight, T)),
        grid=(Mp // T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((T, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, W), src.dtype),
        scratch_shapes=[pltpu.SMEM((T,), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA((min(inflight, T),))],
        interpret=interpret,
    )(idx_p, src)
    return out[:M]


def flat_rows_pallas(src, idx, *, interpret: bool = False):
    """Drop-in for `ops.sparse_conv.flat_rows`: src [B, N, C],
    idx [B, ...] int32 → src[b, idx[b, ...]] via one DMA gather over the
    batch-flattened source."""
    B, N, C = src.shape
    off = (jnp.arange(B, dtype=jnp.int32) * N).reshape(
        (B,) + (1,) * (idx.ndim - 1))
    flat = gather_rows_pallas(src.reshape(B * N, C),
                              (idx + off).reshape(-1), interpret=interpret)
    return flat.reshape(idx.shape + (C,))
