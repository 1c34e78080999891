"""Resident-device mining: the whole wavefront loop inside one XLA program.

The per-level engine (mining/engine.py) pays one host round-trip per trie
level — fatal when the chip sits behind a network tunnel and the trie is
hundreds of levels deep.  Here the entire reference pipeline
(EnumerateQuery DFS + metaserver merge/gates, metaserver.cpp:269-486)
becomes ONE jitted `lax.while_loop` episode:

  * frontier state (intervals, 4 left-extension intervals, packed path
    codes) lives in HBM across levels; expansion is chunked with
    `lax.map` to bound VMEM-adjacent intermediates;
  * every output gate the server applies (metaserver.cpp:403-419) is
    evaluated on device — depth window, pmin/pmax band, entropy window,
    right-branching, left-branching — and passing rows are compacted
    into a device-resident output buffer;
  * the entropy window is gated in float32 with a safety margin; the
    host re-checks drained candidates in float64 with the reference's
    exact expression shapes (engine_np.node_entropy), so emitted lines
    are bit-identical to the oracle while the device never touches f64;
  * the episode exits only to report: frontier-capacity overflow (host
    grows the pow2 bucket and the level is redone — no emission happens
    on the overflow branch, so no duplicates), path-width overflow,
    output-buffer pressure (host drains, resumes), frontier shrink
    (host re-buckets down so deep narrow tails stop paying full-width
    compute), or completion.

Host work per episode is O(drained outputs), not O(trie).  Semantics are
those of engine_np.mine_np in 'ascending' reader order; byte-exact
gnu-order runs use the per-level engine (mine_tpu(reader_order='gnu')).

Entropy min/max *statistics* (stderr diagnostics in the reference,
metaserver.cpp:390-394,805-813) are tracked in float32 here; the output
lines themselves are exact.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..index.alphabet import EXT_CHARS
from ..index.fmindex import FMIndex
from .config import MiningConfig
from .engine import MIN_CAP, DeviceIndexes, _next_pow2, expand_core
from .engine_np import LOG2, MinedOutput, node_entropy

CHUNK = 4096          # expansion chunk rows (bounds the occ-gather buffers)
MIN_PATHCAP = 64
OUT_RESERVE = 1 << 15  # drained-output buffer target size
ENT_MARGIN = 1e-2      # f32 entropy gate slack; host re-gates in f64
FLAG_RUN, FLAG_DONE, FLAG_DRAIN, FLAG_GROW, FLAG_GROWPATH, FLAG_SHRINK = range(6)


@dataclass
class _Scalars:
    """Runtime mining knobs, traced (no recompile across configs)."""

    fmin: object
    pmin: object
    pmax: object
    emin: object
    emax: object
    use_egate: object
    mindepth: object
    maxdepth: object

    @classmethod
    def build(cls, cfg: MiningConfig):
        import jax.numpy as jnp

        i32 = lambda v: jnp.asarray(v, jnp.int32)  # noqa: E731
        maxd = min(cfg.maxdepth, 2**31 - 1)
        return cls(
            fmin=i32(cfg.fmin), pmin=i32(cfg.pmin), pmax=i32(cfg.pmax),
            emin=jnp.asarray(cfg.emin, jnp.float32),
            emax=jnp.asarray(cfg.emax, jnp.float32),
            use_egate=jnp.asarray(cfg.emax > 0, bool),
            mindepth=i32(cfg.mindepth), maxdepth=i32(maxd),
        )

    def flat(self):
        return (self.fmin, self.pmin, self.pmax, self.emin, self.emax,
                self.use_egate, self.mindepth, self.maxdepth)


def _seed_episode(dev: DeviceIndexes, cap: int, pathcap: int):
    import jax.numpy as jnp

    S = dev.S
    state = dict(
        lo=jnp.zeros((cap, S), jnp.int32),
        hi=jnp.zeros((cap, S), jnp.int32).at[0].set(
            jnp.asarray(dev.ns, jnp.int32)),
        elo=jnp.zeros((cap, S, 4), jnp.int32).at[0].set(dev.C4),
        ehi=jnp.zeros((cap, S, 4), jnp.int32).at[0].set(dev.C4hi),
        paths=jnp.zeros((cap, pathcap), jnp.int8),
        nvalid=jnp.asarray(1, jnp.int32),
        depth=jnp.asarray(0, jnp.int32),
        ocount=jnp.asarray(0, jnp.int32),
        out_paths=jnp.zeros((OUT_RESERVE + cap, pathcap), jnp.int8),
        out_freq=jnp.zeros((OUT_RESERVE + cap, S), jnp.int32),
        out_depth=jnp.zeros(OUT_RESERVE + cap, jnp.int32),
        total_paths=jnp.asarray(0, jnp.int32),
        ent_min=jnp.asarray(np.inf, jnp.float32),
        ent_max=jnp.asarray(-np.inf, jnp.float32),
        flag=jnp.asarray(FLAG_RUN, jnp.int32),
    )
    return state


def _chunked_expand(blocks, occ, C4, lo, hi, elo, ehi, valid, fmin):
    """expand_core over CHUNK-row slices via lax.map: bounds the
    (rows, S, 10, BLOCK) occ-gather intermediates regardless of CAP."""
    import jax
    from jax import lax

    cap = lo.shape[0]
    if cap <= CHUNK:
        return expand_core(blocks, occ, C4, lo, hi, elo, ehi, valid, fmin)
    assert cap % CHUNK == 0
    k = cap // CHUNK

    def one(args):
        lo_c, hi_c, elo_c, ehi_c, valid_c = args
        return expand_core(blocks, occ, C4, lo_c, hi_c, elo_c, ehi_c,
                           valid_c, fmin)

    r = lax.map(one, (
        lo.reshape(k, CHUNK, *lo.shape[1:]),
        hi.reshape(k, CHUNK, *hi.shape[1:]),
        elo.reshape(k, CHUNK, *elo.shape[1:]),
        ehi.reshape(k, CHUNK, *ehi.shape[1:]),
        valid.reshape(k, CHUNK),
    ))
    return {key: v.reshape(cap, *v.shape[2:]) for key, v in r.items()}


def _entropy_f32(freq, nactive, d):
    """Gate-precision entropy (metaserver.cpp:356-389 in f32); final
    emission re-checks in exact f64 on the host."""
    import jax.numpy as jnp

    f1 = freq.astype(jnp.float32) + 1.0
    sumNlogN = jnp.sum((f1 * jnp.log(f1)) / np.float32(LOG2), axis=1)
    sumN = (d + freq.sum(axis=1)).astype(jnp.float32)
    return jnp.log(sumN) / np.float32(LOG2) - sumNlogN / sumN


def _episode_body(dev_blocks, dev_occ, dev_C4, sc: _Scalars, prefix_codes,
                  state):
    import jax.numpy as jnp
    from jax import lax

    lo, hi = state["lo"], state["hi"]
    cap, S = lo.shape
    pathcap = state["paths"].shape[1]
    depth = state["depth"]
    valid = jnp.arange(cap, dtype=jnp.int32) < state["nvalid"]

    core = _chunked_expand(dev_blocks, dev_occ, dev_C4, lo, hi,
                           state["elo"], state["ehi"], valid, sc.fmin)

    # per-level symbol mask: enforced prefix, then maxdepth cutoff
    sym_mask = jnp.ones(4, dtype=bool)
    if len(prefix_codes):
        pc = jnp.asarray(prefix_codes, jnp.int32)
        enforced = pc[jnp.minimum(depth, len(prefix_codes) - 1)]
        onehot = jnp.arange(4, dtype=jnp.int32) == enforced
        sym_mask = jnp.where(depth < len(prefix_codes), onehot, sym_mask)
    sym_mask = sym_mask & (depth < sc.maxdepth)

    union_child = (core["child_counts"] > 0) & sym_mask[None, :]
    nactive = core["nactive"]
    numchildren = union_child.sum(axis=-1)
    single_idx = jnp.argmax(union_child, axis=-1)
    single_full = (numchildren == 1) & (
        jnp.take_along_axis(core["child_counts"], single_idx[..., None],
                            axis=-1)[..., 0] == nactive)

    child_count = (union_child & valid[:, None]).sum(dtype=jnp.int32)
    grow = child_count > cap
    grow_path = (depth + 1 >= pathcap) & (child_count > 0)

    def redo(_):
        out = dict(state)
        out["flag"] = jnp.where(grow, FLAG_GROW, FLAG_GROWPATH
                                ).astype(jnp.int32)
        return out

    def advance(_):
        # ---- emit current level (depth >= 1) --------------------------
        freq = core["freq"]
        active = freq > 0
        present = (nactive > 0) & valid & (depth >= 1)
        lc = core["lc"]
        lc_min = jnp.where(active, lc, 99).min(axis=1)
        lc_max = jnp.where(active, lc, -1).max(axis=1)
        lc_agg = jnp.where(lc_min == lc_max, lc_max, 1)  # 1 == LC_N

        ent32 = _entropy_f32(freq, nactive, S)
        egate = jnp.where(
            sc.use_egate,
            (ent32 >= sc.emin - ENT_MARGIN) & (ent32 <= sc.emax + ENT_MARGIN),
            True)
        output = (present & (depth >= sc.mindepth)
                  & (nactive >= sc.pmin)
                  & ((sc.pmax == 0) | (nactive <= sc.pmax))
                  & egate & ~single_full & (lc_agg < 2))

        perm = jnp.argsort(jnp.logical_not(output), stable=True)
        k = output.sum(dtype=jnp.int32)
        oc = state["ocount"]
        out_paths = lax.dynamic_update_slice(
            state["out_paths"], state["paths"][perm], (oc, 0))
        out_freq = lax.dynamic_update_slice(
            state["out_freq"], freq[perm], (oc, 0))
        out_depth = lax.dynamic_update_slice(
            state["out_depth"], jnp.full(cap, depth, jnp.int32), (oc,))
        oc = oc + k

        stat_rows = present & ~((nactive == 1) & (sc.pmin > 1))
        ent_sel = jnp.where(stat_rows, ent32, np.inf)
        ent_min = jnp.minimum(state["ent_min"], ent_sel.min())
        ent_sel = jnp.where(stat_rows, ent32, -np.inf)
        ent_max = jnp.maximum(state["ent_max"], ent_sel.max())
        total_paths = state["total_paths"] + present.sum(dtype=jnp.int32)

        # ---- compact children into the next frontier ------------------
        cv_flat = (union_child & valid[:, None]).reshape(-1)
        cperm = jnp.argsort(jnp.logical_not(cv_flat), stable=True)[:cap]
        parent_row = (cperm // 4).astype(jnp.int32)
        sym = (cperm % 4).astype(jnp.int32)
        valid_next = jnp.arange(cap, dtype=jnp.int32) < child_count

        clo_f = core["clo"].transpose(0, 2, 1).reshape(cap * 4, S)
        chi_f = core["chi"].transpose(0, 2, 1).reshape(cap * 4, S)
        cact_f = core["cactive"].transpose(0, 2, 1).reshape(cap * 4, S)
        celo_f = core["celo"].transpose(0, 3, 1, 2).reshape(cap * 4, S, 4)
        cehi_f = core["cehi"].transpose(0, 3, 1, 2).reshape(cap * 4, S, 4)
        keep = cact_f[cperm] & valid_next[:, None]

        paths_next = state["paths"][parent_row]
        col = jnp.arange(pathcap, dtype=jnp.int32)[None, :]
        paths_next = jnp.where(col == depth, sym[:, None].astype(jnp.int8),
                               paths_next)

        flag = jnp.where(
            child_count == 0, FLAG_DONE,
            jnp.where(oc > OUT_RESERVE, FLAG_DRAIN,
                      jnp.where((child_count * 8 <= cap) & (cap > MIN_CAP),
                                FLAG_SHRINK, FLAG_RUN))).astype(jnp.int32)

        return dict(
            lo=jnp.where(keep, clo_f[cperm], 0),
            hi=jnp.where(keep, chi_f[cperm], 0),
            elo=celo_f[cperm], ehi=cehi_f[cperm],
            paths=paths_next, nvalid=child_count, depth=depth + 1,
            ocount=oc, out_paths=out_paths, out_freq=out_freq,
            out_depth=out_depth, total_paths=total_paths,
            ent_min=ent_min, ent_max=ent_max, flag=flag,
        )

    return lax.cond(grow | grow_path, redo, advance, None)


@functools.cache
def _jitted_episode(cap: int, pathcap: int, prefix_codes: tuple):
    import jax

    def run(blocks, occ, C4, state, *flat_scalars):
        sc = _Scalars(*flat_scalars)

        def cond(st):
            return st["flag"] == FLAG_RUN

        def body(st):
            return _episode_body(blocks, occ, C4, sc, prefix_codes, st)

        return jax.lax.while_loop(cond, body, state)

    return jax.jit(run, donate_argnums=(3,))


def _resize_state(state, cap: int, pathcap: int):
    """Host-side pow2 re-bucketing of the frontier + output buffers."""
    import jax.numpy as jnp

    def pad_rows(a, rows):
        cur = a.shape[0]
        if rows == cur:
            return a
        if rows < cur:
            return a[:rows]
        return jnp.pad(a, ((0, rows - cur),) + ((0, 0),) * (a.ndim - 1))

    def pad_cols(a, cols):
        cur = a.shape[1]
        if cols == cur:
            return a
        if cols < cur:
            raise AssertionError("path width never shrinks")
        return jnp.pad(a, ((0, 0), (0, cols - cur)))

    out = dict(state)
    for k in ("lo", "hi", "elo", "ehi"):
        out[k] = pad_rows(state[k], cap)
    out["paths"] = pad_cols(pad_rows(state["paths"], cap), pathcap)
    for k in ("out_paths", "out_freq", "out_depth"):
        out[k] = pad_rows(state[k], OUT_RESERVE + cap)
    out["out_paths"] = pad_cols(out["out_paths"], pathcap)
    return out


def _drain(out: MinedOutput, cfg: MiningConfig, d: int, state) -> None:
    """Pull output candidates, re-gate the entropy window in exact f64,
    and append formatted lines (ascending reader order)."""
    import jax

    n = int(state["ocount"])
    if n == 0:
        return
    paths, freq, depths = jax.device_get(
        (state["out_paths"][:n], state["out_freq"][:n],
         state["out_depth"][:n]))
    ent = node_entropy(freq.astype(np.int64), d)
    if cfg.emax > 0:
        ok = (ent >= cfg.emin) & (ent <= cfg.emax)
    else:
        ok = np.ones(n, dtype=bool)
    active = freq > 0
    ext = np.frombuffer(EXT_CHARS, dtype=np.uint8)
    for i in np.flatnonzero(ok):
        dep = int(depths[i])
        path = ext[paths[i, :dep].astype(np.int64)].tobytes()
        act = np.flatnonzero(active[i])
        out.total_output += 1
        out.freq_histogram[act.size - 1] += 1
        occs = [(int(r), int(freq[i, r])) for r in act]
        out.total_occs += len(occs)
        out.lines.append((path, float(ent[i]), occs))


def mine_device(
    indexes: list[FMIndex],
    cfg: MiningConfig,
    prefix: bytes = b"",
    dev: DeviceIndexes | None = None,
    cap: int = MIN_CAP,
) -> MinedOutput:
    """Mine with the device-resident episode loop (ascending reader
    order).  Output lines/stats match engine_np.mine_np exactly except
    smallest/largest-entropy diagnostics, which are f32-accurate."""
    import jax.numpy as jnp

    cfg.validate()
    if dev is None:
        dev = DeviceIndexes.build(indexes)
    d = dev.S
    out = MinedOutput(freq_histogram=np.zeros(d, dtype=np.int64))
    sc = _Scalars.build(cfg)
    prefix_codes = tuple(EXT_CHARS.index(b) for b in prefix)

    cap = max(MIN_CAP, _next_pow2(cap) if cap & (cap - 1) else cap)
    pathcap = MIN_PATHCAP
    state = _seed_episode(dev, cap, pathcap)

    while True:
        fn = _jitted_episode(cap, pathcap, prefix_codes)
        state = fn(dev.blocks, dev.occ, dev.C4, state, *sc.flat())
        flag = int(state["flag"])
        if flag == FLAG_DONE:
            _drain(out, cfg, d, state)
            break
        if flag == FLAG_DRAIN:
            _drain(out, cfg, d, state)
            state["ocount"] = jnp.asarray(0, jnp.int32)
        elif flag == FLAG_GROW:
            cap *= 2
            state = _resize_state(state, cap, pathcap)
        elif flag == FLAG_GROWPATH:
            pathcap *= 2
            state = _resize_state(state, cap, pathcap)
        elif flag == FLAG_SHRINK:
            # frontier is front-packed; safe to drop the all-zero tail
            _drain(out, cfg, d, state)
            state["ocount"] = jnp.asarray(0, jnp.int32)
            cap = max(MIN_CAP, _next_pow2(int(state["nvalid"])))
            state = _resize_state(state, cap, pathcap)
        state["flag"] = jnp.asarray(FLAG_RUN, jnp.int32)

    out.total_paths = int(state["total_paths"])
    em, eM = float(state["ent_min"]), float(state["ent_max"])
    out.smallest_entropy = em if np.isfinite(em) else 1000.0
    out.largest_entropy = eM if np.isfinite(eM) else -1000.0
    out.sort_postorder()
    return out
