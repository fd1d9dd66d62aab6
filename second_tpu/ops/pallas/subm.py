"""Pallas TPU kernel: fused submanifold sparse-conv apply.

The XLA apply path (`ops/sparse_conv.py:subm_conv3d_b`) materializes the
[B, K, Q, C] tap stack in HBM between the gather and the einsum — at fhd
stage sizes that round-trip is ~10-20× the source feature bytes and the
gather itself runs at ~10% of HBM bandwidth (NOTES.md cost model). This
kernel fuses the whole apply: for each output-row tile it

  1. DMAs the tile's rank-window starts (the rulebook `safe` rows) into
     SMEM,
  2. DMAs each (dz,dy) plane's kx-row *contiguous window slab*
     `features[start : start+kx]` straight into VMEM (one descriptor per
     plane×row — consecutive x-neighbors are adjacent rows in sorted key
     order, `sparse_conv.py:gather_rulebook`), overlapped `inflight` deep,
  3. resolves tap hits with the precomputed `sel` masks (VPU selects, in
     registers) into one wide [T, K·C] operand, and
  4. runs a single [T, K·C]×[K·C, D] MXU matmul, f32 accumulation.

Nothing but the source features and the [T, D] result touches HBM — the
tap stack never exists. This is the speed-of-light layout for the
reference's spconv rulebook-apply (`middle.py:429-509` / spconv CUDA
gather-mm-scatter), redesigned around TPU DMA engines + the MXU.

Activation: `SECOND_TPU_PALLAS_SUBM=1` reroutes `subm_conv3d_b` here.
Off by default — the axon runtime hangs on remote Pallas compiles
(NOTES.md); interpret-mode tests pin correctness against the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_kernel(T, G, kx, inflight, safe_hbm, feat_hbm, sel_ref, w_ref,
                  out_ref, idx_smem, win_vmem, idx_sem, sems):
    t = pl.program_id(0)
    K = G * kx
    # 1. stage this tile's window-start rows [T, G] into SMEM
    pltpu.make_async_copy(safe_hbm.at[pl.ds(t * T, T)], idx_smem,
                          idx_sem).start()
    pltpu.make_async_copy(safe_hbm.at[pl.ds(t * T, T)], idx_smem,
                          idx_sem).wait()

    # 2. window-slab DMAs: features[start : start+kx] → win_vmem[g, r]
    def dma(n):
        g, r = divmod(n, T)
        return pltpu.make_async_copy(
            feat_hbm.at[pl.ds(idx_smem[r, g], kx), :],
            win_vmem.at[g, r], sems.at[n % inflight])

    total = G * T
    for n in range(total):
        if n >= inflight:
            dma(n - inflight).wait()
        dma(n).start()
    for n in range(max(0, total - inflight), total):
        dma(n).wait()

    # 3. tap-hit selection → one wide [T, K*C] operand (VPU selects)
    parts = []
    for k in range(K):
        g, j = divmod(k, kx)
        acc = win_vmem[g, :, 0, :] * sel_ref[:, k, 0][:, None]
        for i in range(1, kx):
            acc += win_vmem[g, :, i, :] * sel_ref[:, k, i][:, None]
        parts.append(acc)
    wide = jnp.concatenate(parts, axis=-1)              # [T, K*C]

    # 4. single MXU matmul, f32 accumulation
    out_ref[:] = jax.lax.dot(
        wide, w_ref[:], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows_per_tile", "inflight",
                                             "interpret"))
def subm_conv3d_fused_pallas(features, safe, sel, weights, *,
                             rows_per_tile: int = 128, inflight: int = 32,
                             interpret: bool = False):
    """Fused batched submanifold conv apply from a prebuilt rulebook.

    features: [B, N, C]; safe: [B, G, Q] int32 per-plane window starts
    (G = kz·ky, entries in [0, N)); sel: [B, K, Q, kx] bool tap-hit masks
    (K = G·kx, at most one hit per (k, q)); weights: [K, C, D].
    Returns [B, Q, D] float32. Matches `sparse_conv.subm_conv3d_b`'s
    pre-bias/pre-mask output (callers apply bias and the valid mask).
    """
    B, N, C = features.shape
    _, G, Q = safe.shape
    K, _, D = weights.shape
    kx = sel.shape[-1]
    assert K == G * kx

    # batch-flatten + kx-1 zero pad: a sel-accepted tap never wraps past its
    # example (sorted unique keys make wrap matches impossible — see
    # gather_rulebook), so cross-example or padded reads are always masked.
    flat = jnp.concatenate(
        [features.reshape(B * N, C),
         jnp.zeros((kx - 1, C), features.dtype)], axis=0)
    gsafe = safe + (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
    gsafe = gsafe.transpose(0, 2, 1).reshape(B * Q, G)       # [M, G]
    gsel = sel.transpose(0, 2, 1, 3).reshape(B * Q, K, kx)   # [M, K, kx]
    gsel = gsel.astype(features.dtype)

    M = B * Q
    T = min(rows_per_tile, M)
    Mp = -(-M // T) * T
    if Mp != M:
        gsafe = jnp.concatenate(
            [gsafe, jnp.zeros((Mp - M, G), jnp.int32)], axis=0)
        gsel = jnp.concatenate(
            [gsel, jnp.zeros((Mp - M, K, kx), gsel.dtype)], axis=0)

    infl = min(inflight, G * T)
    out = pl.pallas_call(
        functools.partial(_fused_kernel, T, G, kx, infl),
        grid=(Mp // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # safe
            pl.BlockSpec(memory_space=pl.ANY),            # features
            pl.BlockSpec((T, K, kx), lambda i: (i, 0, 0)),   # sel
            pl.BlockSpec((K * C, D), lambda i: (0, 0)),      # weights
        ],
        out_specs=pl.BlockSpec((T, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, D), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((T, G), jnp.int32),
            pltpu.VMEM((G, T, kx, C), features.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((infl,)),
        ],
        interpret=interpret,
    )(gsafe, flat, gsel,
      weights.reshape(K * C, D).astype(features.dtype))
    return out[:M].reshape(B, Q, D)
