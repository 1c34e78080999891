"""Incremental FM-index construction: buffered inserts + index merging.

The RLCSA-equivalent (SURVEY.md §2.2): the reference builds inputs larger
than memory by flushing buffered text into partial indexes and merging
them — `RLCSABuilder::insertSequence/flush` buffers, `getRanks` backward-
searches every buffered suffix against the existing index in parallel,
and `mergeRLCSA` interleaves (rlcsa_builder.cpp:36-78,214-318).

Our merge works directly on the flat BWT representation:

  1. Build the new batch's own index (suffix array + BWT of the batch).
  2. Gap computation — for every batch suffix, the number of existing-
     index suffixes that sort before it.  Processing each text RIGHT TO
     LEFT this is one O(1) recurrence per position,
         r(i) = C_A[c_i] + occ_A(c_i, r(i+1)),
     seeded at each terminator with ntexts_A (existing terminators sort
     first — the distinct-terminator tie-break, matching RLCSA's
     sequence-id ordering, rlcsa.cpp:156-221).  The recurrence is
     sequential in i but VECTORIZED across all texts of the batch
     (right-aligned), so each step is one batched occ over the existing
     index — the same batch-rank primitive the mining engine uses.
  3. Interleave: batch row with batch-rank k lands at merged position
     gaps[k] + k; existing rows fill the rest in order.  BWT symbols
     need no rewriting (every text ends with the shared '\\0' code).

Suffixes tied through terminators may order differently than a
whole-batch rebuild (same as reference-built .fmi files vs ours — see
index/fmi_compat.py): no DNA-pattern query can tell them apart, which
tests/test_incremental.py asserts up to full mining parity.

Each flush yields a complete, saveable FMIndex, so construction is
checkpointable: build per-chunk indexes, persist, merge later — the
workflow of RLCSA's insertFromFile (rlcsa_builder.cpp:80-100).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..ops.rank import OccTable, occ_prefix_np
from ..ops.sa import bwt_from_sa, suffix_array_np
from . import alphabet
from .alphabet import TERM
from .fmindex import DEFAULT_SAMPLERATE, FMIndex


def _batch_codes(texts: Sequence[np.ndarray]):
    parts, lengths, max_len = [], [], 0
    for t in texts:
        if len(t) == 0:
            raise ValueError("cannot index empty texts")
        parts.append(alphabet.encode(np.asarray(t, dtype=np.uint8)))
        parts.append(np.array([TERM], dtype=np.int8))
        lengths.append(len(t) + 1)
        max_len = max(max_len, len(t) + 1)
    return np.concatenate(parts), np.asarray(lengths), max_len


def batch_gaps(table: OccTable, C: np.ndarray, ntexts_a: int,
               codes: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """gaps[i] = # suffixes of the existing index sorting before the batch
    suffix at concatenated position i (distinct-terminator convention)."""
    n_b = codes.shape[0]
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    ends = starts + lengths  # exclusive
    T = lengths.shape[0]
    gaps = np.empty(n_b, dtype=np.int64)
    # terminator rows: all of a's terminators sort first
    gaps[ends - 1] = ntexts_a
    r = np.full(T, ntexts_a, dtype=np.int64)
    maxlen = int(lengths.max())
    for k in range(2, maxlen + 1):
        pos = ends - k
        act = pos >= starts
        p = np.where(act, pos, starts)
        c = codes[p]
        r_new = C[c] + occ_prefix_np(table, c, r)
        r = np.where(act, r_new, r)
        gaps[p[act]] = r[act]
    return gaps


def _merge_bwt(table: OccTable, C: np.ndarray, ntexts_a: int, n_a: int,
               codes: np.ndarray, lengths: np.ndarray,
               sa_backend: str) -> OccTable:
    """One direction of the merge: interleave the batch's BWT into an
    existing BWT by per-suffix gap counts."""
    if sa_backend == "jax":
        from ..ops.sa import suffix_array_jax

        sa_b = np.asarray(suffix_array_jax(codes)).astype(np.int64)
    else:
        sa_b = suffix_array_np(codes)
    bwt_b = bwt_from_sa(codes, sa_b)
    gaps_pos = batch_gaps(table, C, ntexts_a, codes, lengths)
    gaps = gaps_pos[sa_b]            # in batch-rank order; non-decreasing

    n_b = codes.shape[0]
    bwt_a = table.blocks.reshape(-1)[:n_a]
    merged = np.empty(n_a + n_b, dtype=np.int8)
    b_dest = gaps + np.arange(n_b, dtype=np.int64)
    mask = np.ones(n_a + n_b, dtype=bool)
    mask[b_dest] = False
    merged[b_dest] = bwt_b
    merged[mask] = bwt_a
    return OccTable.build(merged)


def merge_indexes(a: FMIndex, texts: Sequence[np.ndarray],
                  names: Sequence[str] | None = None,
                  sa_backend: str = "numpy") -> FMIndex:
    """Merge already-transformed `texts` into index `a` -> new FMIndex.
    Both directions of the bidirectional index are merged with the same
    gap interleave (the reverse direction merges the reversed batch into
    the reversed index)."""
    codes, lengths, max_len = _batch_codes(texts)
    table = _merge_bwt(a.table, a.C, a.number_of_texts, a.n,
                       codes, lengths, sa_backend)
    rparts = []
    enc = [alphabet.encode(np.asarray(t, dtype=np.uint8)) for t in texts]
    for t in enc:
        rparts.append(t[::-1])
        rparts.append(np.array([TERM], dtype=np.int8))
    rcodes = np.concatenate(rparts)
    rtable = _merge_bwt(a.rtable, a.C, a.number_of_texts, a.n,
                        rcodes, lengths, sa_backend)

    return FMIndex(
        n=a.n + codes.shape[0],
        table=table,
        number_of_texts=a.number_of_texts + len(texts),
        max_text_length=max(a.max_text_length, max_len),
        samplerate=a.samplerate,
        names=list(a.names) + (list(names) if names is not None else []),
        _rtable=rtable,
    )


class IncrementalBuilder:
    """TextCollectionBuilder equivalent with bounded memory: buffer
    transformed texts up to `buffer_symbols`, flush each full buffer into
    an index, merging into the running index (TextCollectionBuilder.h:33
    default 5 GiB/10; here the unit is symbols)."""

    def __init__(self, buffer_symbols: int = 64 << 20,
                 samplerate: int = DEFAULT_SAMPLERATE,
                 sa_backend: str = "numpy") -> None:
        self.buffer_symbols = buffer_symbols
        self.samplerate = samplerate
        self.sa_backend = sa_backend
        self._texts: list[np.ndarray] = []
        self._names: list[str] = []
        self._pending = 0
        self._index: FMIndex | None = None

    def insert(self, text: np.ndarray, name: str = "") -> None:
        self._texts.append(np.asarray(text, dtype=np.uint8))
        self._names.append(name)
        self._pending += len(text) + 1
        if self._pending >= self.buffer_symbols:
            self.flush()

    def flush(self) -> None:
        if not self._texts:
            return
        if self._index is None:
            self._index = FMIndex.from_texts(
                self._texts, self._names, samplerate=self.samplerate,
                sa_backend=self.sa_backend)
        else:
            self._index = merge_indexes(self._index, self._texts,
                                        self._names,
                                        sa_backend=self.sa_backend)
        self._texts, self._names, self._pending = [], [], 0

    def finish(self) -> FMIndex:
        self.flush()
        if self._index is None:
            raise ValueError("cannot index an empty collection")
        return self._index
