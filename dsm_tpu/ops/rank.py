"""Batched rank/occ over a small-alphabet BWT — the mining hot primitive.

The reference answers `occ(c, i)` with a Huffman-shaped wavelet tree over
two-level rank bitvectors (HuffWT.h:66-83, BitRank.cpp:191-195) — a
pointer-chase of 2-3 dependent bitvector ranks per query.  On TPU we replace
that with a flat layout sized for the VPU:

  * `blocks`  (nblocks, BLOCK) int8   — BWT codes, PAD-padded tail
  * `occ`     (nblocks+1, SIGMA) int32 — per-symbol counts at block starts
                                         (occ[b, c] = # of c in L[: b*BLOCK])

so `occ(c, i) = occ[i // BLOCK, c] + popcount(blocks[i // BLOCK, : i % BLOCK] == c)`:
one row gather + one 128-lane compare-and-sum, batched over an entire
frontier of queries.  `LF(c, i) = C[c] + occ(c, i)` (FMIndex.h:84-90).

`occ_prefix_np` is the NumPy oracle used by differential tests; `occ_batch`
is the XLA implementation (used under jit).

A Pallas kernel was evaluated and measured SLOWER than XLA's gather on
this toolchain (jax 0.9.0 Mosaic): `tpu.dynamic_gather` only shuffles
within one vreg (8 sublanes / 128 lanes), so big-table vector gathers
are inexpressible, and a scalar fori_loop kernel reaches ~4M queries/s
vs ~50-90M/s for XLA's native gather (measured on v5e; rate is per ROW
regardless of row bytes).  The engine therefore batches XLA gathers and
minimizes gather COUNT instead (mining/engine_device.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..index.alphabet import PAD, SIGMA

BLOCK = 128  # one VPU lane-row per in-block count
LOG2_BLOCK = 7


@dataclass
class OccTable:
    """Sampled occurrence counts + padded code blocks for one BWT."""

    n: int
    blocks: np.ndarray  # (nblocks, BLOCK) int8
    occ: np.ndarray     # (nblocks + 1, SIGMA) int32
    counts: np.ndarray  # (SIGMA,) int64 — total per-symbol counts
    C: np.ndarray       # (SIGMA + 1,) int64 — chars with smaller code

    @classmethod
    def build(cls, bwt: np.ndarray) -> "OccTable":
        n = int(bwt.shape[0])
        nblocks = -(-n // BLOCK) if n else 0
        padded = np.full(nblocks * BLOCK, PAD, dtype=np.int8)
        padded[:n] = bwt
        blocks = padded.reshape(nblocks, BLOCK)
        onehot = blocks[:, :, None] == np.arange(SIGMA, dtype=np.int8)
        per_block = onehot.sum(axis=1, dtype=np.int64)
        occ = np.zeros((nblocks + 1, SIGMA), dtype=np.int64)
        np.cumsum(per_block, axis=0, out=occ[1:])
        counts = occ[-1].copy()
        if n:
            counts[PAD] -= nblocks * BLOCK - n  # padding is not text
            occ[-1, PAD] = counts[PAD]
        C = np.zeros(SIGMA + 1, dtype=np.int64)
        np.cumsum(counts, out=C[1:])
        if int(C[-1]) != n:
            raise AssertionError("occ table count mismatch")
        return cls(n=n, blocks=blocks, occ=occ.astype(np.int32), counts=counts, C=C)


def occ_prefix_np(table: OccTable, syms: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """NumPy oracle: count of syms[j] in L[: pos[j]] for each query j.

    pos is a prefix *length* in [0, n]; this equals the reference's
    inclusive `rank(c, i)` at i = pos-1, with rank(c, -1) == 0
    (BitRank.cpp:191-195 wraps i+1 to 0 for i == (ulong)-1).
    """
    syms = np.atleast_1d(np.asarray(syms))
    pos = np.atleast_1d(np.asarray(pos, dtype=np.int64))
    b, r = pos >> LOG2_BLOCK, pos & (BLOCK - 1)
    base = table.occ[b, syms].astype(np.int64)
    rows = table.blocks[b]  # (Q, BLOCK)
    lane = np.arange(BLOCK, dtype=np.int64)
    inblock = ((rows == syms[:, None]) & (lane[None, :] < r[:, None])).sum(axis=1)
    return base + inblock


def occ_batch(blocks, occ, syms, pos):
    """XLA batched occ: jnp arrays in, (Q,) int32 counts out.

    blocks: (nblocks, BLOCK) int8; occ: (nblocks+1, SIGMA) int32;
    syms: (Q,) int8/int32; pos: (Q,) int32 prefix lengths in [0, n].
    Safe for any pos in range because occ has nblocks+1 rows and the final
    partial block is PAD-padded (PAD never equals a query symbol).
    """
    import jax.numpy as jnp

    pos = pos.astype(jnp.int32)
    syms_i = syms.astype(jnp.int32)
    b = pos >> LOG2_BLOCK
    r = pos & (BLOCK - 1)
    base = occ[b, syms_i]
    rows = jnp.take(blocks, b, axis=0, indices_are_sorted=False, unique_indices=False)
    lane = jnp.arange(BLOCK, dtype=jnp.int32)
    match = (rows == syms.astype(jnp.int8)[..., None]) & (lane < r[..., None])
    return base + jnp.sum(match, axis=-1, dtype=jnp.int32)
