"""Stage-cost microbenches at the observed plateau width (B=1.5M)."""

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

    from dsm_tpu.ops.rank import BLOCK, LOG2_BLOCK, occ_cum

    B = 3 << 19          # 1572864, the plateau bucket
    key = jax.random.PRNGKey(0)
    print(f"platform={jax.default_backend()} B={B}", file=sys.stderr,
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

    NTAB = 1 << 16
    tab = jax.random.randint(key, (NTAB, 32), 0, 2**30, jnp.uint32)
    blk = jax.random.randint(key, (2 * B,), 0, NTAB, jnp.int32)
    rem = jax.random.randint(key, (2 * B,), 0, 128, jnp.int32)
    bench("occ_cum 2B batched (the expand stage)",
          lambda b, r: occ_cum(tab, b, r), blk, rem)

    mask4 = jax.random.bernoulli(key, 0.25, (4 * B,))
    key4 = jnp.where(mask4, lax.iota(jnp.int32, 4 * B), jnp.int32(4 * B))
    ops = [jax.random.randint(key, (4 * B,), 0, 2**20, jnp.int32)
           for _ in range(5)]
    bench("children: 6-op sort 4B",
          lambda k, *vs: lax.sort((k,) + vs, num_keys=1), key4, *ops)
    bench("children: 1-op sort 4B",
          lambda k: lax.sort((k,), num_keys=1), key4)

    maskb = jax.random.bernoulli(key, 0.9, (B,))
    keyb = jnp.where(maskb, lax.iota(jnp.int32, B), jnp.int32(B))
    cols = [jax.random.randint(key, (B,), 0, 2**20, jnp.int32)
            for _ in range(8)]
    bench("stats: 9-op sort B",
          lambda k, *vs: lax.sort((k,) + vs, num_keys=1), keyb, *cols)
    bench("stats: cumsum (B,8)",
          lambda x: jnp.cumsum(x, axis=0), jnp.stack(cols, axis=1))
    bench("hist: 2-op sort B",
          lambda k, v: lax.sort((k, v), num_keys=1), keyb, cols[0])

    # nln windows stage
    fr = jax.random.uniform(key, (B,), jnp.float32, 1.0, 1e6)

    def nln(t):
        from dsm_tpu.mining.engine_device import _nln_windows

        return _nln_windows(t)

    bench("stats: _nln_windows (B,)", nln, fr)

    # writeback + slice
    pr = jnp.zeros((2, 4 * B, 8), jnp.int32)
    rows = jnp.stack(cols, axis=1)
    bench("writeback: dyn_update (B,8) into pr",
          lambda p, r: lax.dynamic_update_slice(p, r[None], (1, 0, 0)),
          pr, rows)
    bench("slice: dyn_slice (B,8) from pr",
          lambda p: lax.dynamic_slice(p, (0, 0, 0), (1, B, 8))[0], pr)

    # elementwise probe: the expand arithmetic (~(B,4) x 6 arrays)
    c4 = jax.random.randint(key, (B, 4), 0, 2**20, jnp.int32)
    bench("elementwise (B,4) x 8 ops",
          lambda a: ((a * 2 + 1) ^ (a >> 3)) + ((a * 5) & 1023) - (a >> 7),
          c4)


if __name__ == "__main__":
    main()
