"""Dissect occ_cum's cost at the plateau width and test restructures."""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np  # noqa: E402


def main() -> None:
    from dsm_tpu.utils.jaxsetup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    from jax import lax

    Q = 3 << 20          # 2B at the plateau bucket
    NTAB = 1 << 16
    key = jax.random.PRNGKey(0)
    tab = jax.random.randint(key, (NTAB, 32), 0, 2**30, jnp.uint32)
    blk = jax.random.randint(key, (Q,), 0, NTAB, jnp.int32)
    rem = jax.random.randint(key, (Q,), 0, 128, jnp.int32)
    print(f"platform={jax.default_backend()} Q={Q}", file=sys.stderr,
          flush=True)

    def bench(name, f, *a, reps=20):
        f2 = jax.jit(f)
        r = f2(*a)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f2(*a)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        print(f"  {name:46s} {dt*1e3:8.2f} ms", file=sys.stderr, flush=True)
        return dt

    bench("gather only (Q,32)", lambda b: jnp.take(tab, b, axis=0), blk)
    bench("gather + base bitcast",
          lambda b: lax.bitcast_convert_type(
              jnp.take(tab, b, axis=0)[:, 1:6], jnp.int32).sum(), blk)

    from dsm_tpu.ops.rank import occ_cum
    bench("occ_cum current", lambda b, r: occ_cum(tab, b, r), blk, rem)

    def occ_v2(blk, rem):
        """(Q,20) flat mask + popcount, MXU dot for the per-plane sum."""
        g = jnp.take(tab, blk, axis=0)                   # (Q, 32)
        base = lax.bitcast_convert_type(g[:, 1:6], jnp.int32)
        planes20 = g[:, 8:28]                            # (Q, 20)
        w = rem >> 5
        bit = (rem & 31).astype(jnp.uint32)
        widx20 = jnp.tile(jnp.arange(4, dtype=jnp.int32), 5)   # (20,)
        full = jnp.where(widx20[None, :] < w[:, None],
                         jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        part = jnp.where(widx20[None, :] == w[:, None],
                         (jnp.uint32(1) << bit[:, None]) - jnp.uint32(1),
                         jnp.uint32(0))
        pc = lax.population_count(planes20 & (full | part))    # (Q, 20)
        sel = np.zeros((20, 5), np.float32)
        for j in range(5):
            sel[4 * j:4 * j + 4, j] = 1.0
        cnt = jnp.dot(pc.astype(jnp.float32), jnp.asarray(sel),
                      preferred_element_type=jnp.float32)
        return base + cnt.astype(jnp.int32)

    r1 = occ_v2(blk, rem)
    r0 = occ_cum(tab, blk, rem)
    assert np.array_equal(np.asarray(r0), np.asarray(r1)), "v2 mismatch"
    bench("occ_v2 (flat20 + MXU dot)", occ_v2, blk, rem)

    def occ_v3(blk, rem):
        """(Q,20) mask + popcount, reshape-sum instead of dot."""
        g = jnp.take(tab, blk, axis=0)
        base = lax.bitcast_convert_type(g[:, 1:6], jnp.int32)
        planes20 = g[:, 8:28]
        w = rem >> 5
        bit = (rem & 31).astype(jnp.uint32)
        widx20 = jnp.tile(jnp.arange(4, dtype=jnp.int32), 5)
        full = jnp.where(widx20[None, :] < w[:, None],
                         jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        part = jnp.where(widx20[None, :] == w[:, None],
                         (jnp.uint32(1) << bit[:, None]) - jnp.uint32(1),
                         jnp.uint32(0))
        pc = lax.population_count(planes20 & (full | part)).astype(jnp.int32)
        cnt = pc.reshape(-1, 5, 4).sum(-1)
        return base + cnt

    r2 = occ_v3(blk, rem)
    assert np.array_equal(np.asarray(r0), np.asarray(r2)), "v3 mismatch"
    bench("occ_v3 (flat20 + reshape-sum)", occ_v3, blk, rem)

    # popcount cost probe
    x20 = jax.random.randint(key, (Q, 20), 0, 2**30, jnp.uint32)
    bench("popcount (Q,20) alone",
          lambda x: lax.population_count(x).sum(), x20)
    x54 = jax.random.randint(key, (Q, 5, 4), 0, 2**30, jnp.uint32)
    bench("popcount (Q,5,4) alone",
          lambda x: lax.population_count(x).sum(), x54)
    bench("AND+popcount+sum-minor (Q,5,4)",
          lambda x: lax.population_count(x & x).sum(-1), x54)


if __name__ == "__main__":
    main()
