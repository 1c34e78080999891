"""Microbenchmarks of the mining-level primitives on the live chip.

Times the exact op shapes the episode level uses, at several bucket
sizes, to locate where the per-level milliseconds go (VERDICT r3 ask).
Run:  python tools/micro_bench.py [LB ...]   (default 18 20 22)
"""

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

    lbs = [int(a) for a in sys.argv[1:]] or [18, 20, 22]
    print(f"platform={jax.default_backend()}", file=sys.stderr)

    def bench(name, f, *a, reps=20):
        f2 = jax.jit(f)
        r = f2(*a)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f2(*a)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        print(f"  {name:42s} {dt*1e3:8.2f} ms", file=sys.stderr)
        return dt

    key = jax.random.PRNGKey(0)
    NTAB = 1 << 16          # occ-table rows at scale 100 (~64k blocks)
    tab32 = jax.random.randint(key, (NTAB, 32), 0, 2**30, jnp.uint32)
    tab32_flat = tab32.reshape(-1)
    meta = jax.random.randint(key, (512, 8), 0, 2**20, jnp.int32)

    for LB in lbs:
        B = 1 << LB
        print(f"\nLB={LB}  B={B}", file=sys.stderr)
        idx = jax.random.randint(key, (B,), 0, NTAB, jnp.int32)
        sid = jax.random.randint(key, (B,), 0, 512, jnp.int32)
        rows8 = jax.random.randint(key, (B, 8), 0, 2**20, jnp.int32)
        flat = jax.random.randint(key, (B,), 0, 2**20, jnp.int32)
        mask4 = jax.random.bernoulli(key, 0.25, (4 * B,))
        skey4 = jnp.where(mask4, lax.iota(jnp.int32, 4 * B),
                          jnp.int32(4 * B))

        # gathers
        bench("row-gather (B,32)u32 from 64k-row table",
              lambda i: jnp.take(tab32, i, axis=0), idx)
        bench("1-D gather B from 2M-elem table",
              lambda i: jnp.take(tab32_flat, i), idx * 32)
        bench("1-D gather B from 512-elem table",
              lambda s: jnp.take(meta[:, 0], s), sid)
        bench("row-gather (B,8)i32 from 512-row table",
              lambda s: jnp.take(meta, s, axis=0), sid)
        bench("row-gather (B,8)i32 from (B,8) table",
              lambda i: jnp.take(rows8, i & (B - 1), axis=0), idx)

        # scans
        bench("cumsum (B,8) axis0", lambda x: jnp.cumsum(x, axis=0), rows8)
        bench("cumsum 1-D B", lambda x: jnp.cumsum(x), flat)
        bench("cumsum 1-D 4B", lambda x: jnp.cumsum(x),
              jnp.concatenate([flat] * 4))
        bench("cumsum 2-pass (B/128,128)",
              lambda x: _cumsum2(jnp, lax, x, B), flat)

        # sorts
        bench("sort 1-D B i32", lambda k: lax.sort((k,), num_keys=1),
              skey4[:B])
        bench("sort 1-D 4B i32", lambda k: lax.sort((k,), num_keys=1),
              skey4)
        bench("sort 4B 2-operand",
              lambda k, v: lax.sort((k, v), num_keys=1), skey4,
              jnp.concatenate([flat] * 4))

        # elementwise traffic probes
        bench("elemwise (B,8) x*2+1", lambda x: x * 2 + 1, rows8)
        bench("elemwise 1-D 8B x*2+1", lambda x: x * 2 + 1,
              jnp.concatenate([flat] * 8))
        bench("where+mul (4B,) i32",
              lambda m, x: jnp.where(m, x, 0),
              mask4, jnp.concatenate([flat] * 4))

        # occ_cum itself
        from dsm_tpu.ops.rank import occ_cum
        rem = jax.random.randint(key, (B,), 0, 128, jnp.int32)
        bench("occ_cum B queries (64k-row fused table)",
              lambda b, r: occ_cum(tab32, b, r), idx, rem)

        # dynamic_update_slice into big 1-D buffer
        big = jnp.zeros(1 << 26, jnp.int32)
        bench("dyn_update_slice B into 64M 1-D",
              lambda h, g: lax.dynamic_update_slice(h, g, (jnp.int32(5),)),
              big, flat)


def _cumsum2(jnp, lax, x, B):
    g = x.reshape(B // 128, 128)
    rows = jnp.cumsum(g, axis=1)
    tot = jnp.cumsum(rows[:, -1])
    return (rows + (tot - rows[:, -1])[:, None]).reshape(B)


if __name__ == "__main__":
    main()
