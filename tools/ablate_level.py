"""Ablation timing of the episode level at a real plateau state.

Runs the scale-100 episode to a given level, snapshots the state, then
times the FULL level function and stage-ablated variants on that same
state — attributing in-loop milliseconds to stages exactly (standalone
microbenches over-count by dispatch overhead and under-count fusion).

Usage: python tools/ablate_level.py [target_level=30]
"""

from __future__ import annotations

import functools
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

    from dsm_tpu.mining import engine_device as ed
    from dsm_tpu.mining.config import MiningConfig
    from dsm_tpu.mining.engine import DeviceIndexes
    from dsm_tpu.index.fmindex import FMIndex

    target = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    datadir = "/tmp/dsm_tpu_bench_s100/data"
    idxs = [FMIndex.load(os.path.join(datadir, f"toy{s}.fasta.dtfmi"))
            for s in range(5)]
    cfg = MiningConfig(fmin=2, emax=1.2)
    dev = DeviceIndexes.build(idxs)
    sc = ed._Scalars.build(cfg)
    cap = ed._auto_cap(dev, ed.DEV_MIN_CAP)
    hist_cap = ed._hist_cap(dev)
    state = ed._seed_episode(dev, cap, hist_cap)
    ladder = ed.bucket_ladder(ed.PAIR_HEADROOM * cap)

    def level_k(state):
        need = max(int(state["npairs"]), int(state["nnodes"]) + 1)
        ki = min(sum(1 for b in ladder if b < need) + int(state["boost"]),
                 len(ladder) - 1)
        return ladder[ki]

    @functools.cache
    def one_level(b):
        fn = functools.partial(ed._level_single, b, dev.frowsT,
                               dev.rrowsT, dev.S, sc, hist_cap)
        return jax.jit(fn)

    for lvl in range(target):
        b = level_k(state)
        state = one_level(b)(state)
        state["flag"] = jnp.asarray(ed.FLAG_RUN, jnp.int32)
        state["ocount"] = jnp.asarray(0, jnp.int32)
        state["hist_len"] = jnp.asarray(0, jnp.int32)
        state["nlev"] = jnp.asarray(0, jnp.int32)
    jax.block_until_ready(state["pr"])
    B = level_k(state)
    print(f"state at level {target}: P={int(state['npairs'])} "
          f"U={int(state['nnodes'])} B={B}", file=sys.stderr, flush=True)

    def bench(name, f, reps=20):
        # donate + chain: without donation every call copies ~1 GB of
        # state buffers, swamping stage differences.  Chaining evolves
        # the state through consecutive plateau levels (representative).
        fj = jax.jit(f, donate_argnums=(0,))
        r = jax.tree.map(lambda x: x + 0 if hasattr(x, 'dtype') else x,
                         state)
        r = fj(r)
        jax.block_until_ready(r["flag"])
        t0 = time.perf_counter()
        for _ in range(reps):
            r["flag"] = jnp.asarray(ed.FLAG_RUN, jnp.int32)
            r["ocount"] = jnp.asarray(0, jnp.int32)
            r["hist_len"] = jnp.asarray(0, jnp.int32)
            r["nlev"] = jnp.asarray(0, jnp.int32)
            r = fj(r)
        jax.block_until_ready(r["flag"])
        print(f"  {name:40s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms",
              file=sys.stderr, flush=True)

    def fresh_full():
        # a NEW function object per bench: jax caches traces on function
        # identity, so reusing one partial would reuse the unpatched trace
        return lambda st: ed._level_single(B, dev.frowsT, dev.rrowsT,
                                           dev.S, sc, hist_cap, st)

    bench("FULL level", fresh_full())

    # ablations: monkeypatched stage shortcuts
    import dsm_tpu.ops.rank as rank

    real_occ = rank.occ_cum
    real_sort = ed.lax_sort_ref = None

    def occ_dummy(rows, blk, rem):
        import jax.numpy as jnp
        sh = blk.shape + (5,)
        return (blk[..., None] + rem[..., None]).astype(jnp.int32) * \
            jnp.ones(sh, jnp.int32)

    # patch the episode's actual rank entry point (occ_cum8T since the
    # round-5 transposed-layout redesign)
    def occ8_dummy(rowsT, blk, rem, pos):
        import jax.numpy as jnp
        return jnp.broadcast_to((blk + rem + pos)[None, :].astype(jnp.int32),
                                (8, blk.shape[0]))

    ed_occ8 = ed.occ_cum8T
    ed.occ_cum8T = occ8_dummy
    try:
        bench("no-occ (dummy ranks)", fresh_full())
    finally:
        ed.occ_cum8T = ed_occ8

    from jax import lax as _lax
    real_lax_sort = _lax.sort

    def fake_sort(operands, num_keys=1, **kw):
        # skip the sort network: return operands unchanged
        return tuple(operands)

    _lax.sort = fake_sort
    try:
        bench("no-sorts (all sorts identity)", fresh_full())
    finally:
        _lax.sort = real_lax_sort

    def sort_key_only(operands, num_keys=1, **kw):
        out = real_lax_sort(operands[:1], num_keys=1)
        return tuple(out) + tuple(operands[1:])

    _lax.sort = sort_key_only
    try:
        bench("key-only sorts (payloads skipped)", fresh_full())
    finally:
        _lax.sort = real_lax_sort


if __name__ == "__main__":
    main()
