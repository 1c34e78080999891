"""Round 2: why does slicing gathered (Q,32) rows cost ~21ms?"""

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

    Q = 3 << 20
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

    bench("gather.sum() (no slice)",
          lambda b: jnp.take(tab, b, axis=0).sum(), blk)
    bench("gather[:, 1:6].sum()",
          lambda b: jnp.take(tab, b, axis=0)[:, 1:6].sum(), blk)
    bench("gather[:, 0:5].sum()",
          lambda b: jnp.take(tab, b, axis=0)[:, 0:5].sum(), blk)
    bench("gather[:, 8:28].sum()",
          lambda b: jnp.take(tab, b, axis=0)[:, 8:28].sum(), blk)
    bench("bitcast(whole).sum()",
          lambda b: lax.bitcast_convert_type(
              jnp.take(tab, b, axis=0), jnp.int32).sum(), blk)
    bench("gather narrow table (NTAB,8) rows",
          lambda b: jnp.take(tab[:, :8], b, axis=0).sum(), blk)

    sel5 = np.zeros((32, 5), np.float32)
    for j in range(5):
        sel5[j + 1, j] = 1.0
    selp = np.zeros((32, 5), np.float32)
    for j in range(5):
        selp[8 + 4 * j: 12 + 4 * j, j] = 1.0

    def occ_v4(blk, rem):
        """No slicing at all: one (Q,32) mask+popcount, three MXU dots
        (planes count + base hi/lo 16-bit halves)."""
        g = jnp.take(tab, blk, axis=0)                   # (Q, 32)
        w = rem >> 5
        bit = (rem & 31).astype(jnp.uint32)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 32), 1)
        wordi = (col - 8) & 3          # word index within plane (cols 8..27)
        is_plane = (col >= 8) & (col < 28)
        full = jnp.where(is_plane & (wordi < w[:, None]),
                         jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        part = jnp.where(is_plane & (wordi == w[:, None]),
                         (jnp.uint32(1) << bit[:, None]) - jnp.uint32(1),
                         jnp.uint32(0))
        pc = lax.population_count(g & (full | part)).astype(jnp.float32)
        cnt = jnp.dot(pc, jnp.asarray(selp),
                      preferred_element_type=jnp.float32)
        glo = (g & jnp.uint32(0xFFFF)).astype(jnp.float32)
        ghi = (g >> 16).astype(jnp.float32)
        blo = jnp.dot(glo, jnp.asarray(sel5),
                      preferred_element_type=jnp.float32)
        bhi = jnp.dot(ghi, jnp.asarray(sel5),
                      preferred_element_type=jnp.float32)
        base = blo.astype(jnp.int32) + (bhi.astype(jnp.int32) << 16)
        return base + cnt.astype(jnp.int32)

    from dsm_tpu.ops.rank import occ_cum
    r0 = occ_cum(tab, blk, rem)
    r4 = occ_v4(blk, rem)
    assert np.array_equal(np.asarray(r0), np.asarray(r4)), "v4 mismatch"
    bench("occ_v4 (no slice, 3 MXU dots)", occ_v4, blk, rem)
    bench("occ_cum current", lambda b, r: occ_cum(tab, b, r), blk, rem)


if __name__ == "__main__":
    main()
