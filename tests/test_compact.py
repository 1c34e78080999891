"""Differential tests for the rank/select stream compaction primitive."""

import numpy as np
import pytest

from dsm_tpu.ops.compact import compact_kidx, compact_kidx_np


@pytest.mark.parametrize("density", [0.0, 0.003, 0.25, 0.5, 0.97, 1.0])
@pytest.mark.parametrize("n", [256, 8192, 65536])
def test_compact_matches_oracle(rng, density, n):
    import jax

    mask = rng.random(n) < density
    width = n
    kidx, count = jax.jit(compact_kidx, static_argnums=1)(mask, width)
    kidx = np.asarray(kidx)
    want, want_count = compact_kidx_np(mask, width)
    assert int(count) == want_count
    assert np.array_equal(kidx[:want_count], want[:want_count])
    # garbage slots stay in range (safe to gather)
    assert (kidx >= 0).all() and (kidx < n).all()


def test_compact_short_width(rng):
    import jax

    n = 8192
    mask = rng.random(n) < 0.9
    width = 1024  # fewer slots than set bits: prefix only
    kidx, count = jax.jit(compact_kidx, static_argnums=1)(mask, width)
    want = np.flatnonzero(mask)
    assert int(count) == len(want)
    assert np.array_equal(np.asarray(kidx), want[:width])


def test_compact_blocky_patterns():
    """Empty leading blocks, full blocks, single bits at block edges."""
    import jax

    n = 4096
    mask = np.zeros(n, dtype=bool)
    mask[255] = True      # last bit of block 0
    mask[256] = True      # first bit of block 1
    mask[1024:1280] = True  # a full block
    mask[n - 1] = True
    kidx, count = jax.jit(compact_kidx, static_argnums=1)(mask, n)
    want, want_count = compact_kidx_np(mask, n)
    assert int(count) == want_count
    assert np.array_equal(np.asarray(kidx)[:want_count], want[:want_count])
