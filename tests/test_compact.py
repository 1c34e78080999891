"""Differential tests for both stream-compaction primitives.

compact_kidx_sort is the production path (every episode-level
compaction); compact_kidx is the retained rank/select alternative —
both must match the NumPy oracle on the same inputs (ADVICE r3 #1)."""

import numpy as np
import pytest

from dsm_tpu.ops.compact import compact_kidx, compact_kidx_np, compact_kidx_sort

VARIANTS = {"rankselect": compact_kidx, "sort": compact_kidx_sort}


@pytest.mark.parametrize("variant", list(VARIANTS))
@pytest.mark.parametrize("density", [0.0, 0.003, 0.25, 0.5, 0.97, 1.0])
@pytest.mark.parametrize("n", [256, 8192, 65536])
def test_compact_matches_oracle(rng, variant, density, n):
    import jax

    fn = VARIANTS[variant]
    mask = rng.random(n) < density
    width = n
    kidx, count = jax.jit(fn, static_argnums=1)(mask, width)
    kidx = np.asarray(kidx)
    want, want_count = compact_kidx_np(mask, width)
    assert int(count) == want_count
    assert np.array_equal(kidx[:want_count], want[:want_count])
    # garbage slots stay in range (safe to gather)
    assert (kidx >= 0).all() and (kidx < n).all()


@pytest.mark.parametrize("variant", list(VARIANTS))
def test_compact_short_width(rng, variant):
    import jax

    fn = VARIANTS[variant]
    n = 8192
    mask = rng.random(n) < 0.9
    width = 1024  # fewer slots than set bits: prefix only
    kidx, count = jax.jit(fn, static_argnums=1)(mask, width)
    want = np.flatnonzero(mask)
    assert int(count) == len(want)
    assert np.array_equal(np.asarray(kidx), want[:width])


@pytest.mark.parametrize("variant", list(VARIANTS))
def test_compact_blocky_patterns(variant):
    """Empty leading blocks, full blocks, single bits at block edges."""
    import jax

    fn = VARIANTS[variant]
    n = 4096
    mask = np.zeros(n, dtype=bool)
    mask[255] = True      # last bit of block 0
    mask[256] = True      # first bit of block 1
    mask[1024:1280] = True  # a full block
    mask[n - 1] = True
    kidx, count = jax.jit(fn, static_argnums=1)(mask, n)
    want, want_count = compact_kidx_np(mask, n)
    assert int(count) == want_count
    assert np.array_equal(np.asarray(kidx)[:want_count], want[:want_count])


def test_mining_frontier_past_min_bucket(rng):
    """A frontier wider than DEV_MIN_CAP=8192 forces the episode onto
    larger ladder buckets (and the bucket-refit/boost retry when the
    survivors outgrow a level's width) — ADVICE r3 #1: CI-sized toy
    data never left the smallest bucket.  3 random 70kb samples give a
    ~200k-pair frontier; the episode must match the oracle exactly."""
    from dsm_tpu.index.alphabet import transform
    from dsm_tpu.index.fmindex import FMIndex
    from dsm_tpu.mining.config import MiningConfig
    from dsm_tpu.mining.engine_device import mine_device
    from dsm_tpu.mining.engine_np import mine_np

    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    idxs = []
    for s in range(3):
        text = bases[rng.integers(0, 4, size=70_000)].tobytes()
        idxs.append(FMIndex.from_texts([transform(text)]))
    cfg = MiningConfig(fmin=2, emax=1.9, maxdepth=11)
    want = mine_np(idxs, cfg)
    got = mine_device(idxs, cfg)
    assert got.format_lines() == want.format_lines()
    assert got.total_paths == want.total_paths
