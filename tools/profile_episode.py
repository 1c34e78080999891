"""Per-level profiler for the device mining episode (SURVEY §5.1).

Runs the scale-N bench workload but steps the episode ONE level at a
time from the host (same `_level_at_bucket` switch the production
while_loop runs), recording wall time, bucket size, pair/node counts and
flag per level.  This is the instrumentation VERDICT r3 asked for: it
tells you exactly where the 81-level episode spends its time.

Usage:  python tools/profile_episode.py [scale]
Env:    DSM_PROFILE_MICRO=1  also microbench the per-level primitives
        (sort, occ_cum gather, cumsum) at the observed widths.
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

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    datadir = f"/tmp/dsm_tpu_bench_s{scale}/data"
    if not os.path.isdir(datadir):
        sys.path.insert(0, os.path.join(HERE, "tests"))
        from tests.make_toydata import make_toydata

        os.makedirs(datadir, exist_ok=True)
        make_toydata(datadir, scale=scale)
    idxs = []
    for s in range(5):
        cache = os.path.join(datadir, f"toy{s}.fasta.dtfmi")
        if not os.path.exists(cache):
            from dsm_tpu.index.alphabet import transform
            from dsm_tpu.index.fasta import read_fasta

            texts = [transform(r.seq)
                     for r in read_fasta(cache[: -len(".dtfmi")])]
            idx = FMIndex.from_texts(texts, names=[f"toy{s}.fasta"])
            idx.save(cache)
        idxs.append(FMIndex.load(cache))

    cfg = MiningConfig(fmin=2, emax=1.2)
    dev = DeviceIndexes.build(idxs)
    sc = ed._Scalars.build(cfg)
    cap = ed._auto_cap(dev, ed.DEV_MIN_CAP)
    hist_cap = ed._hist_cap(dev)
    state = ed._seed_episode(dev, cap, hist_cap)
    ladder = ed.bucket_ladder(ed.PAIR_HEADROOM * cap)
    print(f"profile: scale={scale} platform={jax.default_backend()} "
          f"cap=2^{cap.bit_length()-1} ladder={ladder}", file=sys.stderr)

    @functools.cache
    def one_level():
        def run(frows, rrows, state, *flat):
            s = ed._Scalars(*flat)
            lad = jnp.asarray(ladder, jnp.int32)
            need = jnp.maximum(state["npairs"], state["nnodes"] + 1)
            k = jnp.clip(jnp.sum(lad < need) + state["boost"], 0,
                         len(ladder) - 1)
            branches = [
                functools.partial(ed._level_single, b, frows, rrows,
                                  dev.S, s, hist_cap)
                for b in ladder
            ]
            return lax.switch(k, branches, state)
        return jax.jit(run, donate_argnums=(2,))

    fn = one_level()
    rows = []
    t_all0 = time.perf_counter()
    lvl = 0
    while True:
        P, U, bst = (int(state["npairs"]), int(state["nnodes"]),
                     int(state["boost"]))
        need = max(P, U + 1)
        ki = min(sum(1 for b in ladder if b < need) + bst, len(ladder) - 1)
        lb = ladder[ki]
        t0 = time.perf_counter()
        state = fn(dev.frowsT, dev.rrowsT, state, *sc.flat())
        jax.block_until_ready(state["flag"])
        dt = time.perf_counter() - t0
        flag = int(state["flag"])
        rows.append((lvl, int(state["depth"]), lb, P, U, flag, dt))
        lvl += 1
        if flag in (ed.FLAG_DONE, ed.FLAG_TAIL, ed.FLAG_GROW):
            break
        if flag in (ed.FLAG_DRAIN, ed.FLAG_HISTFULL):
            # profiler: just reset the buffers, don't drain for real
            state["ocount"] = jnp.asarray(0, jnp.int32)
            state["hist_len"] = jnp.asarray(0, jnp.int32)
            state["nlev"] = jnp.asarray(0, jnp.int32)
        state["flag"] = jnp.asarray(ed.FLAG_RUN, jnp.int32)
        if lvl > 4000:
            break
    total = time.perf_counter() - t_all0

    print(f"\n lvl depth        B        P        U flag    ms",
          file=sys.stderr)
    by_lb: dict[int, list[float]] = {}
    for (lvl, depth, lb, P, U, flag, dt) in rows:
        by_lb.setdefault(lb, []).append(dt)
        if dt > 0.02 or lvl < 5:
            print(f"{lvl:4d} {depth:5d} {lb:8d} {P:8d} {U:8d} "
                  f"{flag:4d} {dt*1e3:8.1f}", file=sys.stderr)
    print(f"\ntotal levels={len(rows)} wall={total:.2f}s", file=sys.stderr)
    print("per-bucket summary:", file=sys.stderr)
    for lb in sorted(by_lb):
        ts = by_lb[lb]
        print(f"  B={lb:>8}: n={len(ts):3d} "
              f"sum={sum(ts):6.2f}s  mean={1e3*sum(ts)/len(ts):7.1f}ms",
              file=sys.stderr)

    if os.environ.get("DSM_PROFILE_MICRO") == "1":
        micro(jax, jnp, lax, dev, by_lb)


def micro(jax, jnp, lax, dev, by_lb):
    """Microbench the primitives at the hot bucket widths."""
    import time as _t

    from dsm_tpu.ops.rank import BLOCK, LOG2_BLOCK, occ_cum

    def bench(f, *a, reps=10):
        r = f(*a)
        jax.block_until_ready(r)
        t0 = _t.perf_counter()
        for _ in range(reps):
            r = f(*a)
        jax.block_until_ready(r)
        return (_t.perf_counter() - t0) / reps

    hot = sorted(by_lb, key=lambda lb: -sum(by_lb[lb]))[:3]
    for lb in sorted(hot):
        B = 1 << lb
        key = jnp.arange(4 * B, dtype=jnp.int32) % 7
        mask = key < 3
        skey = jnp.where(mask, lax.iota(jnp.int32, 4 * B), jnp.int32(4 * B))

        sort1 = jax.jit(lambda k: lax.sort((k,), num_keys=1))
        t_sort4 = bench(sort1, skey)
        t_sort1 = bench(sort1, skey[:B])

        rows8 = jnp.zeros((B, 8), jnp.int32)
        t_cumsum = bench(jax.jit(lambda x: jnp.cumsum(x, axis=0)), rows8)

        n = int(dev.ns.sum())
        pos = (jnp.arange(B, dtype=jnp.int32) * 2654435761 % max(n // 5, 1))
        t_occ = bench(jax.jit(lambda p: occ_cum(
            dev.frows, p >> LOG2_BLOCK, p & (BLOCK - 1))), pos)

        gat = jax.jit(lambda i: jnp.take(jnp.zeros((4 * B, 8), jnp.int32),
                                         i, axis=0))
        t_take = bench(gat, key[:B])
        print(f"  micro LB={lb} (B={B}): sort4B={t_sort4*1e3:.1f}ms "
              f"sortB={t_sort1*1e3:.1f}ms cumsum(B,8)={t_cumsum*1e3:.1f}ms "
              f"occ_cum(B)={t_occ*1e3:.1f}ms take(B of 4B,8)={t_take*1e3:.1f}ms",
              file=sys.stderr)


if __name__ == "__main__":
    main()
