"""Multi-payload stream compaction as a Pallas TPU kernel.

`compact_rows(mask, values, width)` moves the rows of `values (N, C)`
whose mask bit is set to the front of a `(width, C)` output, preserving
order — the per-level "children/stats/emit" data movement of the mining
episode.  The production alternative is a (C+1)-operand `lax.sort`
(ops/compact.compact_kidx_sort + payloads), which costs ~0.65 ms per
million lanes PER OPERAND on v5e; this kernel streams the data once and
does the within-tile permutation on the MXU.

Design (TPU-native):
  * the grid walks the input in BLK-row blocks (double-buffered
    HBM->VMEM via BlockSpec); TPU grids execute sequentially on the
    core, so a running output offset lives in SMEM across steps;
  * within a block, each 128-row tile is compacted by an MXU
    permutation: rank[i] = (tril_ones @ mask)[i] (exclusive prefix
    count), selT[i, r] = mask[i] & (rank[i] == r), compacted =
    selT^T @ vals via a transposed-contraction dot.  int32 payloads are
    pre-split into 16-bit halves so the f32 MXU arithmetic is exact
    (sums of <= 128 terms of < 2^16 values);
  * tiles append into a VMEM scratch at their running in-block offsets;
    each block DMAs its full BLK-row scratch to the output at the
    global offset — the garbage tail beyond the block's live count is
    overwritten by the next block's write, and the final tail lands
    past the returned count (same contract as compact_kidx_sort:
    slots beyond `count` hold in-range garbage).

The output is allocated N+BLK rows so every full-block write stays in
bounds; callers receive the leading `width` rows.

STATUS on the current toolchain (jax 0.9.0 + axon remote compile): the
kernel is correct in interpret mode, but the remote Mosaic compile
helper returns HTTP 500 for ANY kernel containing async-DMA semaphores
(bisected: a trivial grid+SMEM-carry kernel compiles; adding one
make_async_copy crashes the helper), and plain dynamic-offset VMEM
stores trip a masked-swap lowering bug.  Both building blocks are
required here, so the production episode keeps the multi-operand-sort
compaction (ops/compact.compact_kidx_sort) until the toolchain moves.
"""

from __future__ import annotations

import functools

import numpy as np

BLK = 2048      # rows per grid step (16 tiles of 128)
TILE = 128


def _kernel(c: int, tril_ref, mask_ref, vlo_ref, vhi_ref, out_lo_ref,
            out_hi_ref, cnt_ref, off_smem, scratch_lo, scratch_hi,
            tile_lo, tile_hi, sem):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    step = pl.program_id(0)
    # unpredicated select: a store under pl.when trips a Mosaic masked-
    # swap lowering bug on this toolchain
    off_smem[0] = jnp.where(step == 0, 0, off_smem[0])

    tril = tril_ref[:, :]
    iota_c = lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)

    local = jnp.int32(0)
    for t in range(BLK // TILE):
        sl = pl.ds(t * TILE, TILE)
        m = mask_ref[sl, :]                                # (TILE, 1) f32
        rank = jnp.dot(tril, m, preferred_element_type=jnp.float32
                       ).astype(jnp.int32)
        selT = jnp.where(rank == iota_c, m, 0.0)           # (i, r)
        dn = (((0,), (0,)), ((), ()))
        vlo = lax.dot_general(selT, vlo_ref[sl, :], dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
        vhi = lax.dot_general(selT, vhi_ref[sl, :], dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
        k = jnp.sum(m, dtype=jnp.float32).astype(jnp.int32)
        # dynamic-offset VMEM stores trip a Mosaic masked-swap lowering
        # bug on this toolchain; a VMEM->VMEM DMA at a dynamic
        # destination offset is fine
        tile_lo[:, :] = vlo
        tile_hi[:, :] = vhi
        cpl = pltpu.make_async_copy(
            tile_lo, scratch_lo.at[pl.ds(local, TILE)], sem)
        cpl.start()
        cpl.wait()
        cph = pltpu.make_async_copy(
            tile_hi, scratch_hi.at[pl.ds(local, TILE)], sem)
        cph.start()
        cph.wait()
        local = local + k

    off = off_smem[0]
    cp1 = pltpu.make_async_copy(scratch_lo.at[pl.ds(0, BLK), :],
                                out_lo_ref.at[pl.ds(off, BLK), :], sem)
    cp1.start()
    cp1.wait()
    cp2 = pltpu.make_async_copy(scratch_hi.at[pl.ds(0, BLK), :],
                                out_hi_ref.at[pl.ds(off, BLK), :], sem)
    cp2.start()
    cp2.wait()
    off_smem[0] = off + local
    cnt_ref[0, 0] = off + local


@functools.cache
def _jitted_call(n: int, c: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = n // BLK

    tril_h = np.tril(np.ones((TILE, TILE), np.float32), k=-1)

    def run(mask, values):
        u = values.astype(jnp.uint32)
        vlo = (u & jnp.uint32(0xFFFF)).astype(jnp.float32)
        vhi = (u >> 16).astype(jnp.float32)
        mcol = mask.astype(jnp.float32)[:, None]           # (n, 1)
        out_lo, out_hi, cnt = pl.pallas_call(
            functools.partial(_kernel, c),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((TILE, TILE), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n + BLK, c), jnp.float32),
                jax.ShapeDtypeStruct((n + BLK, c), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.SMEM((1,), jnp.int32),
                pltpu.VMEM((BLK + TILE, c), jnp.float32),
                pltpu.VMEM((BLK + TILE, c), jnp.float32),
                pltpu.VMEM((TILE, c), jnp.float32),
                pltpu.VMEM((TILE, c), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(jnp.asarray(tril_h), mcol, vlo, vhi)
        return out_lo, out_hi, cnt[0, 0]

    return jax.jit(run)


def compact_rows(mask, values, width: int):
    """Compacted (width, C) int32 rows of `values` where mask is set,
    plus the live count.  mask: bool (N,); values: int32 (N, C); N must
    be a multiple of BLK.  Rows past `count` hold garbage."""
    import jax.numpy as jnp

    n, c = values.shape
    assert n % BLK == 0, "input rows must be a multiple of BLK"
    out_lo, out_hi, cnt = _jitted_call(n, c)(mask, values)
    lo_i = out_lo[:width].astype(jnp.int32)
    hi_i = out_hi[:width].astype(jnp.int32)
    return lo_i | (hi_i << 16), cnt


def compact_rows_np(mask: np.ndarray, values: np.ndarray, width: int):
    """NumPy oracle."""
    idx = np.flatnonzero(mask)
    out = np.zeros((width, values.shape[1]), dtype=values.dtype)
    k = min(len(idx), width)
    out[:k] = values[idx[:k]]
    return out, len(idx)
