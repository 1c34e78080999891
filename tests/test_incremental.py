"""Incremental construction vs whole-batch rebuild: query equivalence.

Merged indexes may order terminator-tied suffixes differently than a
single from_texts build (distinct-terminator convention, like RLCSA) —
asserted invisible to every mining-relevant query: C table, pattern
counts, the --check invariant, and full mining output.
"""

import numpy as np
import pytest

from dsm_tpu.index.alphabet import transform
from dsm_tpu.index.fmindex import FMIndex
from dsm_tpu.index.incremental import IncrementalBuilder, merge_indexes
from dsm_tpu.mining.config import MiningConfig
from dsm_tpu.mining.engine_np import mine_np


@pytest.fixture(scope="module")
def texts(rng):
    genome = np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, size=900)]
    out = []
    for i in range(40):
        start = int(rng.integers(0, 800))
        out.append(transform(genome[start:start + 100].tobytes()))
    return out


def assert_equivalent(a: FMIndex, b: FMIndex, rng):
    assert a.n == b.n
    assert a.number_of_texts == b.number_of_texts
    assert np.array_equal(a.C, b.C)
    assert a.check() and b.check()
    flat_a = np.sort(a.table.blocks.reshape(-1)[: a.n])
    flat_b = np.sort(b.table.blocks.reshape(-1)[: b.n])
    assert np.array_equal(flat_a, flat_b)
    for _ in range(60):
        m = int(rng.integers(1, 15))
        pat = bytes(rng.choice(list(b"ACGT"), size=m).tolist())
        assert a.count(pat) == b.count(pat), pat


@pytest.mark.parametrize("split", [1, 7, 13])
def test_merge_matches_rebuild(texts, rng, split):
    whole = FMIndex.from_texts(texts)
    first = FMIndex.from_texts(texts[:split])
    merged = merge_indexes(first, texts[split:])
    assert_equivalent(whole, merged, rng)


def test_incremental_builder_multiflush(texts, rng):
    whole = FMIndex.from_texts(texts)
    b = IncrementalBuilder(buffer_symbols=600)  # many flushes
    for t in texts:
        b.insert(t)
    merged = b.finish()
    assert_equivalent(whole, merged, rng)


def test_mining_parity_with_merged_indexes(texts, rng):
    """Mining with merged indexes == mining with rebuilt indexes."""
    groups = [texts[:14], texts[14:27], texts[27:]]
    rebuilt = [FMIndex.from_texts(g) for g in groups]
    merged = []
    for g in groups:
        base = FMIndex.from_texts(g[:4])
        merged.append(merge_indexes(base, g[4:]))
    cfg = MiningConfig(fmin=2, emax=99)
    want = mine_np(rebuilt, cfg)
    got = mine_np(merged, cfg)
    assert got.format_lines() == want.format_lines()
    assert got.total_paths == want.total_paths
