"""Round-5 occ_cum experiments: kill the base-slice relayout cost.

micro_occ.py showed (v5e, Q=3M): gather only 14.8 ms, but
`bitcast(g[:, 1:6])` lifts it to 35.8 ms — the minor-dim slice of the
gathered (Q, 32) rows forces a lane relayout that costs more than the
gather itself.  These variants extract the base WITHOUT any minor-dim
slice (MXU dots over the full 32-wide row, 16-bit split for exactness).

Run: python tools/micro_occ3.py
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

    Q = 3 << 20
    NTAB = 1 << 16
    key = jax.random.PRNGKey(0)
    # full-range uint32 like the baked-C4 tables
    tab = lax.bitcast_convert_type(
        jax.random.randint(key, (NTAB, 32), -2**31, 2**31 - 1, jnp.int32),
        jnp.uint32)
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
        print(f"  {name:52s} {dt*1e3:8.2f} ms", file=sys.stderr, flush=True)
        return dt

    from dsm_tpu.ops.rank import occ_cum

    bench("gather only (Q,32)", lambda b: jnp.take(tab, b, axis=0), blk)
    bench("occ_cum current", lambda b, r: occ_cum(tab, b, r), blk, rem)
    bench("slice base only: bitcast(g[:,1:6])",
          lambda b: lax.bitcast_convert_type(
              jnp.take(tab, b, axis=0)[:, 1:6], jnp.int32).sum(axis=0),
          blk)
    bench("bitcast whole then slice",
          lambda b: lax.bitcast_convert_type(
              jnp.take(tab, b, axis=0), jnp.int32)[:, 1:6].sum(axis=0),
          blk)
    bench("aligned head slice g[:, :8]",
          lambda b: lax.bitcast_convert_type(
              jnp.take(tab, b, axis=0)[:, :8], jnp.int32).sum(axis=0),
          blk)

    # --- v4: zero minor-dim slices; one fused mask+popcount over all 32
    # cols; base via two 16-bit-split f32 MXU dots ---------------------
    selb = np.zeros((32, 5), np.float32)
    for j in range(5):
        selb[1 + j, j] = 1.0
    selp = np.zeros((32, 5), np.float32)
    for j in range(5):
        selp[8 + 4 * j: 8 + 4 * j + 4, j] = 1.0
    SELB = jnp.asarray(selb)
    SELP = jnp.asarray(selp)
    # per-column plane word index (col-8) % 4 for cols 8..27, else -1
    colw = np.full(32, -1, np.int32)
    for c in range(8, 28):
        colw[c] = (c - 8) % 4
    COLW = jnp.asarray(colw)

    def occ_v4(blk, rem):
        g = jnp.take(tab, blk, axis=0)                     # (Q, 32) u32
        w = rem >> 5
        bit = (rem & 31).astype(jnp.uint32)
        full = jnp.where(COLW[None, :] < w[:, None],
                         jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        full = jnp.where(COLW[None, :] < 0, jnp.uint32(0), full)
        part = jnp.where(COLW[None, :] == w[:, None],
                         (jnp.uint32(1) << bit[:, None]) - jnp.uint32(1),
                         jnp.uint32(0))
        pc = lax.population_count(g & (full | part))       # (Q, 32)
        glo = (g & jnp.uint32(0xFFFF)).astype(jnp.float32)
        ghi = (g >> 16).astype(jnp.float32)
        blo = jnp.dot(glo, SELB, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
        bhi = jnp.dot(ghi, SELB, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
        cnt = jnp.dot(pc.astype(jnp.float32), SELP,
                      preferred_element_type=jnp.float32)
        base = blo.astype(jnp.int32) + (bhi.astype(jnp.int32) << 16)
        return base + cnt.astype(jnp.int32)

    r0 = np.asarray(occ_cum(tab, blk, rem))
    r4 = np.asarray(occ_v4(blk, rem))
    assert np.array_equal(r0, r4), "v4 mismatch"
    bench("occ_v4 (no-slice, 16-bit-split dots)", occ_v4, blk, rem)

    # v5: single concatenated dot
    SELCAT = jnp.asarray(np.block(
        [[selb, np.zeros((32, 5), np.float32), np.zeros((32, 5), np.float32)],
         [np.zeros((32, 5), np.float32), selb, np.zeros((32, 5), np.float32)],
         [np.zeros((32, 5), np.float32), np.zeros((32, 5), np.float32), selp]]
    ))  # (96, 15)

    def occ_v5(blk, rem):
        g = jnp.take(tab, blk, axis=0)
        w = rem >> 5
        bit = (rem & 31).astype(jnp.uint32)
        full = jnp.where(COLW[None, :] < w[:, None],
                         jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        full = jnp.where(COLW[None, :] < 0, jnp.uint32(0), full)
        part = jnp.where(COLW[None, :] == w[:, None],
                         (jnp.uint32(1) << bit[:, None]) - jnp.uint32(1),
                         jnp.uint32(0))
        pc = lax.population_count(g & (full | part))
        cat = jnp.concatenate(
            [(g & jnp.uint32(0xFFFF)).astype(jnp.float32),
             (g >> 16).astype(jnp.float32),
             pc.astype(jnp.float32)], axis=1)              # (Q, 96)
        o = jnp.dot(cat, SELCAT, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
        return (o[:, 0:5].astype(jnp.int32)
                + (o[:, 5:10].astype(jnp.int32) << 16)
                + o[:, 10:15].astype(jnp.int32))

    r5 = np.asarray(occ_v5(blk, rem))
    assert np.array_equal(r0, r5), "v5 mismatch"
    bench("occ_v5 (one concat dot)", occ_v5, blk, rem)

    # row-width scaling of the raw gather (is it rate- or byte-bound?)
    for wdt in (8, 16, 32, 64):
        t = jax.random.randint(key, (NTAB, wdt), 0, 2**30, jnp.uint32)
        bench(f"gather only (Q,{wdt})",
              lambda b, tt=t: jnp.take(tt, b, axis=0), blk)

    # does sorting the block indices help the gather?
    blks = jnp.sort(blk)
    bench("gather sorted idx (Q,32)",
          lambda b: jnp.take(tab, b, axis=0), blks)


if __name__ == "__main__":
    main()
