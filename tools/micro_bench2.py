"""Second-round microbenches: sorted-index gathers, scatter-max+cummax,
multi-operand sorts — the primitives that decide the level redesign.

Run:  python tools/micro_bench2.py [LB ...]   (default 20 22)
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

    lbs = [int(a) for a in sys.argv[1:]] or [20, 22]
    print(f"platform={jax.default_backend()}", file=sys.stderr, flush=True)

    def bench(name, f, *a, reps=20):
        f2 = jax.jit(f)
        r = f2(*a)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f2(*a)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        print(f"  {name:48s} {dt*1e3:8.2f} ms", file=sys.stderr, flush=True)
        return dt

    key = jax.random.PRNGKey(0)

    for LB in lbs:
        B = 1 << LB
        print(f"\nLB={LB}  B={B}", file=sys.stderr, flush=True)
        tbl8 = jax.random.randint(key, (B, 8), 0, 2**20, jnp.int32)
        tbl8_4 = jax.random.randint(key, (4 * B, 8), 0, 2**20, jnp.int32)
        rnd = jax.random.randint(key, (B,), 0, B, jnp.int32)
        # ascending indices touching ~77% of rows (node boundaries)
        asc = jnp.sort(jax.random.randint(key, (B,), 0, B, jnp.int32))
        # ascending in 4 runs (c-major compaction output)
        runs4 = jnp.concatenate(
            [jnp.sort(jax.random.randint(key, (B // 4,), i * B, (i + 1) * B,
                                         jnp.int32)) for i in range(4)])
        flat = jax.random.randint(key, (B,), 0, 2**20, jnp.int32)

        bench("row-gather (B,8) rnd idx       [baseline]",
              lambda i: jnp.take(tbl8, i, axis=0), rnd)
        bench("row-gather (B,8) asc idx",
              lambda i: jnp.take(tbl8, i, axis=0), asc)
        bench("row-gather (B,8) asc idx sorted-hint",
              lambda i: jnp.take(tbl8, i, axis=0, indices_are_sorted=True),
              asc)
        bench("row-gather B rows of (4B,8), 4 asc runs",
              lambda i: jnp.take(tbl8_4, i, axis=0), runs4)
        bench("1-D gather B asc from (B,)",
              lambda i: jnp.take(tbl8[:, 0], i), asc)
        bench("1-D gather B asc sorted-hint",
              lambda i: jnp.take(tbl8[:, 0], i, indices_are_sorted=True),
              asc)

        # scatter-max at sorted indices + cummax (compact_kidx pattern at
        # full width): per-pair node-id reconstruction candidate
        nvals = jax.random.randint(key, (B,), 0, 2**20, jnp.int32)

        def scat_cummax(pos, val):
            arr = jnp.full(B, -1, jnp.int32).at[pos].max(
                val, mode="drop", indices_are_sorted=True)
            return lax.cummax(arr)

        bench("scatter-max B sorted + cummax B", scat_cummax, asc, nvals)

        def scat_cummax_u(pos, val):
            arr = jnp.full(B, -1, jnp.int32).at[pos].max(
                val, mode="drop", indices_are_sorted=True,
                unique_indices=True)
            return lax.cummax(arr)

        bench("scatter-max B sorted+unique + cummax B",
              scat_cummax_u, jnp.unique(asc, size=B, fill_value=B), nvals)

        # multi-operand sorts (fused compaction candidates)
        mask4 = jax.random.bernoulli(key, 0.25, (4 * B,))
        key4 = jnp.where(mask4, lax.iota(jnp.int32, 4 * B), jnp.int32(4 * B))
        ops = [jax.random.randint(key, (4 * B,), 0, 2**20, jnp.int32)
               for _ in range(6)]
        bench("sort 4B 1-op", lambda k: lax.sort((k,), num_keys=1), key4)
        bench("sort 4B 3-op",
              lambda k, a, b: lax.sort((k, a, b), num_keys=1),
              key4, ops[0], ops[1])
        bench("sort 4B 6-op",
              lambda k, *vs: lax.sort((k,) + vs, num_keys=1),
              key4, *ops[:5])

        # cumsum over bool->int at 4B (child numbering)
        bench("cumsum 4B from bool", lambda m: jnp.cumsum(
            m.astype(jnp.int32)), mask4)

        # dynamic_update_slice of (B,8) into (2,PROW,8)
        big3 = jnp.zeros((2, 2 * B, 8), jnp.int32)
        bench("dyn_update (B,8) into (2,2B,8)",
              lambda b, r: lax.dynamic_update_slice(b, r[None], (1, 0, 0)),
              big3, tbl8)

        # gather with take_along_axis style: (B,) from (B,4) columns
        c4 = jax.random.randint(key, (B, 4), 0, 2**20, jnp.int32)
        ci = jax.random.randint(key, (B,), 0, 4, jnp.int32)
        bench("take_along_axis (B,) from (B,4)",
              lambda t, i: jnp.take_along_axis(
                  t, i[:, None], axis=1)[:, 0], c4, ci)


if __name__ == "__main__":
    main()
