"""Round-5 children-compaction experiments at the plateau shape.

Ablation (tools/ablate_level.py, level 30, B=1.5M): the 7-operand
c-major children sort moves ~44 ms of payload per level while the key
sort itself costs ~6 ms.  Candidates to replace payload sorting:

  A. current: lax.sort((key, 6 payloads)) over 4B lanes
  B. key+iota sort (2 ops) -> one (wp, 8) row gather from a
     materialized (4B, 8) childrows table
  C. same but childrows built from (4, B)-major components
     (concat along major dim, no per-element interleave)

Run: python tools/micro_sort5.py
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

    B = 1 << 20 | 1 << 19          # 1.5M, the plateau bucket
    WP = B                          # kept width
    KEEPP = 0.25
    key = jax.random.PRNGKey(0)
    print(f"platform={jax.default_backend()} B={B}", file=sys.stderr,
          flush=True)

    # plateau-shaped inputs: (B, 4) child tables + per-pair meta
    clo = jax.random.randint(key, (B, 4), -2**31, 2**31 - 1, jnp.int32)
    chi = jax.random.randint(key, (B, 4), -2**31, 2**31 - 1, jnp.int32)
    crlo = jax.random.randint(key, (B, 4), 0, 2**30, jnp.int32)
    sid = jax.random.randint(key, (B,), 0, 5, jnp.int32)
    soff = jax.random.randint(key, (B,), 0, 2**20, jnp.int32)
    nid = jnp.cumsum(jax.random.bernoulli(key, 0.7, (B,)).astype(jnp.int32))
    keep = jax.random.bernoulli(key, KEEPP, (B, 4))

    def bench(name, f, *a, reps=20):
        f2 = jax.jit(f)
        r = f2(*a)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f2(*a)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        print(f"  {name:56s} {dt*1e3:8.2f} ms", file=sys.stderr, flush=True)
        return dt

    iota4b = lax.iota(jnp.int32, 4 * B)

    def variant_a(clo, chi, crlo, sid, soff, nid, keep):
        K = keep.T.reshape(4 * B)
        key4 = jnp.where(K, iota4b, jnp.int32(4 * B))
        sidsoff = soff * jnp.int32(512) + sid
        skey, s_clo, s_chi, s_crlo, s_ss, s_nid = lax.sort(
            (key4, clo.T.reshape(4 * B), chi.T.reshape(4 * B),
             crlo.T.reshape(4 * B), jnp.tile(sidsoff, 4),
             jnp.tile(nid, 4)), num_keys=1)
        return (skey[:WP], s_clo[:WP], s_chi[:WP], s_crlo[:WP],
                s_ss[:WP], s_nid[:WP])

    def variant_b(clo, chi, crlo, sid, soff, nid, keep):
        K = keep.T.reshape(4 * B)
        key4 = jnp.where(K, iota4b, jnp.int32(4 * B))
        (skey,) = lax.sort((key4,), num_keys=1)
        kidx = jnp.minimum(skey[:WP], 4 * B - 1)
        sidsoff = soff * jnp.int32(512) + sid
        childrows = jnp.stack(
            [clo.T, chi.T, crlo.T,
             jnp.broadcast_to(sidsoff[None, :], (4, B)),
             jnp.broadcast_to(nid[None, :], (4, B)),
             jnp.zeros((4, B), jnp.int32),
             jnp.zeros((4, B), jnp.int32),
             jnp.zeros((4, B), jnp.int32)], axis=2).reshape(4 * B, 8)
        return skey[:WP], jnp.take(childrows, kidx, axis=0)

    def variant_c(clo, chi, crlo, sid, soff, nid, keep):
        # c-major components first (4, B), childrows via reshape of a
        # (8, 4, B) stack -> transpose to (4B, 8)?  Try building as
        # (4B, 8) through one transpose of (8, 4B).
        K = keep.T.reshape(4 * B)
        key4 = jnp.where(K, iota4b, jnp.int32(4 * B))
        (skey,) = lax.sort((key4,), num_keys=1)
        kidx = jnp.minimum(skey[:WP], 4 * B - 1)
        sidsoff = soff * jnp.int32(512) + sid
        flat = jnp.stack(
            [clo.T.reshape(4 * B), chi.T.reshape(4 * B),
             crlo.T.reshape(4 * B), jnp.tile(sidsoff, 4),
             jnp.tile(nid, 4), jnp.zeros(4 * B, jnp.int32),
             jnp.zeros(4 * B, jnp.int32), jnp.zeros(4 * B, jnp.int32)],
            axis=0)                                    # (8, 4B)
        childrows = flat.T                             # (4B, 8)
        return skey[:WP], jnp.take(childrows, kidx, axis=0)

    def variant_d(clo, chi, crlo, sid, soff, nid, keep):
        # gather the 6 payload columns SEPARATELY (1-D gathers)
        K = keep.T.reshape(4 * B)
        key4 = jnp.where(K, iota4b, jnp.int32(4 * B))
        (skey,) = lax.sort((key4,), num_keys=1)
        kidx = jnp.minimum(skey[:WP], 4 * B - 1)
        sidsoff = soff * jnp.int32(512) + sid
        outs = [jnp.take(a.T.reshape(4 * B), kidx)
                for a in (clo, chi, crlo)]
        p = kidx % B
        outs.append(jnp.take(sidsoff, p))
        outs.append(jnp.take(nid, p))
        return (skey[:WP], *outs)

    ra = variant_a(clo, chi, crlo, sid, soff, nid, keep)
    rb = variant_b(clo, chi, crlo, sid, soff, nid, keep)
    rc = variant_c(clo, chi, crlo, sid, soff, nid, keep)
    # correctness: kept prefixes agree
    kn = int(np.asarray(keep).sum())
    a_clo = np.asarray(ra[1])[:kn]
    b_rows = np.asarray(rb[1])[:kn]
    c_rows = np.asarray(rc[1])[:kn]
    assert np.array_equal(a_clo, b_rows[:, 0]), "b mismatch"
    assert np.array_equal(a_clo, c_rows[:, 0]), "c mismatch"
    assert np.array_equal(np.asarray(ra[4])[:kn], b_rows[:, 3])

    bench("A: 6-payload c-major sort (current)", variant_a,
          clo, chi, crlo, sid, soff, nid, keep)
    bench("B: key sort + (4B,8) stack + row gather", variant_b,
          clo, chi, crlo, sid, soff, nid, keep)
    bench("C: key sort + (8,4B) stack + T + row gather", variant_c,
          clo, chi, crlo, sid, soff, nid, keep)
    bench("D: key sort + six 1-D gathers", variant_d,
          clo, chi, crlo, sid, soff, nid, keep)

    # stats alternatives: 9-op sort vs boundary gather
    stat = jax.random.randint(key, (B, 8), 0, 2**20, jnp.int32)
    nbs = jnp.sort(jax.random.randint(key, (B + 1,), 0, B, jnp.int32))

    def stats_sort(stat, nid):
        cum_i = jnp.cumsum(stat, axis=0)
        iota_b = lax.iota(jnp.int32, B)
        nxt = jnp.concatenate([nid[1:], jnp.full((1,), -1, jnp.int32)])
        lstp = (nid != nxt) | (iota_b == B - 1)
        keyl = jnp.where(lstp, iota_b, jnp.int32(B))
        sel = lax.sort((keyl,) + tuple(cum_i[:, j] for j in range(8)),
                       num_keys=1)
        return jnp.stack(sel[1:], axis=1)

    def stats_gather(stat, nbs):
        cum = jnp.concatenate(
            [jnp.zeros((1, 8), jnp.int32), jnp.cumsum(stat, axis=0)])
        gb = jnp.take(cum, jnp.clip(nbs, 0, B), axis=0)
        return gb[1:] - gb[:-1]

    bench("stats: 9-operand last-pair sort (current)", stats_sort,
          stat, nid)
    bench("stats: cum + nb boundary row gather", stats_gather, stat, nbs)


def decompose() -> None:
    from dsm_tpu.utils.jaxsetup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    from jax import lax

    B = 1 << 20 | 1 << 19
    key = jax.random.PRNGKey(0)
    print(f"decompose: platform={jax.default_backend()} B={B}",
          file=sys.stderr, flush=True)

    def bench(name, f, *a, reps=20):
        f2 = jax.jit(f)
        r = f2(*a)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f2(*a)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        print(f"  {name:56s} {dt*1e3:8.2f} ms", file=sys.stderr, flush=True)
        return dt

    keep = jax.random.bernoulli(key, 0.25, (4 * B,))
    iota4b = lax.iota(jnp.int32, 4 * B)
    key4 = jnp.where(keep, iota4b, jnp.int32(4 * B))
    bench("1-op key sort over 4B", lambda k: lax.sort((k,), num_keys=1)[0],
          key4)
    bench("2-op key sort over 4B",
          lambda k: lax.sort((k, k + 1), num_keys=1)[0], key4)

    clo = jax.random.randint(key, (B, 4), -2**31, 2**31 - 1, jnp.int32)
    arrs = [jax.random.randint(key, (4 * B,), 0, 2**30, jnp.int32)
            for _ in range(8)]
    bench("(4B,8) stack from 8 flat arrays",
          lambda *a: jnp.stack(a, axis=1), *arrs)
    bench("one (B,4).T transpose+reshape",
          lambda c: c.T.reshape(4 * B) + 1, clo)

    kidx = jnp.sort(jax.random.randint(key, (B,), 0, 4 * B, jnp.int32))
    gf = lambda tt, i: jnp.take(tt, i, axis=0)
    for nrows, w in ((4 * B, 8), (B, 8), (1 << 16, 8), (4 * B, 16)):
        t = jax.random.randint(key, (nrows, w), 0, 2**30, jnp.int32)
        bench(f"row gather {B/1e6:.1f}M rows from ({nrows},{w})",
              gf, t, kidx)
    kidxr = jax.random.randint(key, (B,), 0, 4 * B, jnp.int32)
    t = jax.random.randint(key, (4 * B, 8), 0, 2**30, jnp.int32)
    bench("row gather unsorted idx from (4B,8)", gf, t, kidxr)


if __name__ == "__main__":
    decompose()
