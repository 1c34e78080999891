"""Resident-device mining: the whole wavefront loop inside one XLA program.

The per-level engine (mining/engine.py) pays one host round-trip per trie
level — fatal when the chip sits behind a network tunnel and the trie is
hundreds of levels deep.  Here the entire reference pipeline
(EnumerateQuery DFS + metaserver merge/gates, metaserver.cpp:269-486)
becomes ONE jitted `lax.while_loop` episode:

  * frontier state — the bidirectional intervals (lo, hi, rlo), 3 int32
    per (node, sample) — lives in HBM across levels; each level runs as a
    fori_loop over CHUNK-row slices with a DYNAMIC trip count
    ceil(nvalid/CHUNK), so compute scales with the live frontier width,
    not the capacity bucket — capacity buckets can then be few and large
    (GROWTH=8), minimizing episode recompiles;
  * each chunk fuses expansion (4 fused-row ranks per node-sample,
    ops/rank.py), the output gates, and stream compaction of both the
    output rows and the next frontier (running offsets + fixed-width
    updates whose garbage tails the next chunk overwrites);
  * NO path strings are materialized on device: each child appends one
    packed int32 (parent_row*4 + symbol) to a history buffer; the host
    reconstructs the few paths it needs (gated outputs, tail handoff,
    checkpoints) by walking the pulled history backwards (PathHistory) —
    this removes the former (CAP, 256)-byte path buffer whose per-level
    traffic rivaled the expansion itself;
  * every output gate the server applies (metaserver.cpp:403-419) is
    evaluated on device — depth window, pmin/pmax band, entropy window,
    right-branching, left-branching — and passing rows are compacted
    into a device-resident output buffer as (level-row, depth, freqs);
  * the entropy window is gated in float32 with a safety margin; the
    host re-checks drained candidates in float64 with the reference's
    exact expression shapes (engine_np.node_entropy), so emitted lines
    are bit-identical to the oracle while the device never touches f64;
  * the episode exits only to report: frontier-capacity overflow (host
    grows the pow2 bucket and the level is redone — no emission happens
    on the overflow branch, so no duplicates), history-buffer pressure
    (host pulls the finished levels, resets, and the level is redone),
    output-buffer pressure (host drains, resumes), frontier shrink
    (host re-buckets down so deep narrow tails stop paying full-width
    compute), or completion;
  * frontiers that turn narrow past TAIL_MIN_DEPTH exit to the host
    wavefront (engine_np.mine_from_level) — the deep-thin-tail regime
    where a host level costs less than a device step.

Host work per episode is O(drained outputs + history ints), not O(trie
bytes).  Semantics are those of engine_np.mine_np in 'ascending' reader
order; byte-exact gnu-order runs use the per-level engine
(mine_tpu(reader_order='gnu')).

Entropy min/max *statistics* (stderr diagnostics in the reference,
metaserver.cpp:390-394,805-813) are tracked in float32 here; the output
lines themselves are exact.
"""

from __future__ import annotations

import functools
import os
import sys
import threading
import time
from dataclasses import dataclass

import numpy as np

from ..index.alphabet import EXT_CHARS
from ..index.fmindex import FMIndex
from .config import MiningConfig
from .engine import DeviceIndexes, expand_core
from .engine_np import LOG2, MinedOutput, node_entropy

CHUNK = 4096          # per-chunk rows: bounds the rank-gather intermediates
#                       and is the work granularity (compute scales with
#                       ceil(nvalid/CHUNK), not with the capacity bucket)
DEV_MIN_CAP = CHUNK   # frontier buffers must hold >= one chunk
GROWTH = 8            # capacity bucket growth factor: every distinct cap
#                       bucket compiles its own episode program; chunked
#                       processing makes a big bucket nearly free, so keep
#                       buckets few (the next bucket is precompiled in a
#                       background thread while the current one mines)
OUT_RESERVE = 1 << 15  # drained-output buffer target size
HIST_CAP = 1 << 22     # packed parent*4+sym history entries per segment
LVL_CAP = 1 << 13      # per-segment level-length slots
ENT_MARGIN = 1e-2      # f32 entropy gate slack; host re-gates in f64
(FLAG_RUN, FLAG_DONE, FLAG_DRAIN, FLAG_GROW, FLAG_HISTFULL, FLAG_SHRINK,
 FLAG_TAIL) = range(7)

# Hand the frontier to the host numpy wavefront once it is this narrow
# and past this depth: a TPU while-loop iteration costs ~the same for 2
# live rows as for MIN_CAP, and deep tries (long repeats) have thousands
# of near-empty levels — the reference's followOneBranch fast lane
# (EnumerateQuery.cpp:105-149) solves the same problem recursively.
TAIL_WIDTH = 768
TAIL_MIN_DEPTH = 12


def _bucket(x: int) -> int:
    """Smallest DEV_MIN_CAP * GROWTH**k >= x (the only frontier sizes)."""
    cap = DEV_MIN_CAP
    while cap < x:
        cap *= GROWTH
    return cap


class PathHistory:
    """Host-side decoder for the device's packed parent-pointer history.

    Level d's entries (one int32 per node: parent_row*4 + sym, in frontier
    row order) are written while level d-1 expands; segments pulled at
    episode exits accumulate here keyed by absolute depth.  base_paths
    seeds rows at base_depth (checkpoint resume)."""

    def __init__(self, base_depth: int = 0,
                 base_paths: list[bytes] | None = None) -> None:
        self.base_depth = base_depth
        self.base = base_paths if base_paths is not None else [b""]
        self.levels: dict[int, np.ndarray] = {}

    def add_segment(self, d0: int, packed: np.ndarray,
                    lens: np.ndarray) -> None:
        """Levels d0+1 .. d0+len(lens) from one pulled device segment."""
        off = 0
        for k, ln in enumerate(np.asarray(lens, dtype=np.int64).tolist()):
            self.levels[d0 + k + 1] = packed[off:off + ln]
            off += ln

    def decode(self, depth: int, rows: np.ndarray) -> list[bytes]:
        """Paths of frontier `rows` at `depth` (vectorized walk down)."""
        rows = np.asarray(rows, dtype=np.int64)
        m = rows.shape[0]
        k = depth - self.base_depth
        syms = np.zeros((m, k), dtype=np.int64)
        r = rows.copy()
        for d in range(depth, self.base_depth, -1):
            e = self.levels[d][r]
            syms[:, d - self.base_depth - 1] = e & 3
            r = e >> 2
        ext = np.frombuffer(EXT_CHARS, dtype=np.uint8)
        return [self.base[int(r[i])] + ext[syms[i]].tobytes()
                for i in range(m)]


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
    tail_width: object
    out_reserve: object

    @classmethod
    def build(cls, cfg: MiningConfig, tail_width: int = TAIL_WIDTH,
              out_reserve: int = OUT_RESERVE):
        import jax.numpy as jnp

        i32 = lambda v: jnp.asarray(v, jnp.int32)  # noqa: E731
        maxd = min(cfg.maxdepth, 2**31 - 1)
        return cls(
            fmin=i32(cfg.fmin), pmin=i32(cfg.pmin), pmax=i32(cfg.pmax),
            emin=jnp.asarray(cfg.emin, jnp.float32),
            emax=jnp.asarray(cfg.emax, jnp.float32),
            use_egate=jnp.asarray(cfg.emax > 0, bool),
            mindepth=i32(cfg.mindepth), maxdepth=i32(maxd),
            tail_width=i32(tail_width), out_reserve=i32(out_reserve),
        )

    def flat(self):
        return (self.fmin, self.pmin, self.pmax, self.emin, self.emax,
                self.use_egate, self.mindepth, self.maxdepth,
                self.tail_width, self.out_reserve)


def _seed_episode(dev: DeviceIndexes, cap: int):
    import jax.numpy as jnp

    S = dev.S
    ocap = OUT_RESERVE + cap + CHUNK
    return dict(
        lo=jnp.zeros((cap, S), jnp.int32),
        hi=jnp.zeros((cap, S), jnp.int32).at[0].set(
            jnp.asarray(dev.ns, jnp.int32)),
        rlo=jnp.zeros((cap, S), jnp.int32),
        nvalid=jnp.asarray(1, jnp.int32),
        depth=jnp.asarray(0, jnp.int32),
        hist=jnp.zeros(HIST_CAP + 4 * CHUNK, jnp.int32),
        hist_len=jnp.asarray(0, jnp.int32),
        lvl_len=jnp.zeros(LVL_CAP, jnp.int32),
        nlev=jnp.asarray(0, jnp.int32),
        out_freq=jnp.zeros((ocap, S), jnp.int32),
        out_row=jnp.zeros(ocap, jnp.int32),
        out_depth=jnp.zeros(ocap, jnp.int32),
        ocount=jnp.asarray(0, jnp.int32),
        total_paths=jnp.asarray(0, jnp.int32),
        ent_min=jnp.asarray(np.inf, jnp.float32),
        ent_max=jnp.asarray(-np.inf, jnp.float32),
        flag=jnp.asarray(FLAG_RUN, jnp.int32),
    )


def _entropy_f32(freq, nactive, d):
    """Gate-precision entropy (metaserver.cpp:356-389 in f32); final
    emission re-checks in exact f64 on the host."""
    import jax.numpy as jnp

    f1 = freq.astype(jnp.float32) + 1.0
    sumNlogN = jnp.sum((f1 * jnp.log(f1)) / np.float32(LOG2), axis=1)
    sumN = (d + freq.sum(axis=1)).astype(jnp.float32)
    return jnp.log(sumN) / np.float32(LOG2) - sumNlogN / sumN


def _episode_body(dev_frows, dev_rrows, dev_soff, dev_C4, sc: _Scalars,
                  prefix_codes, state):
    """One trie level, processed in CHUNK-row slices with a DYNAMIC trip
    count: compute scales with the live frontier width (state["nvalid"]),
    not the capacity bucket, so buckets can be few and large without a
    padding tax.  Each chunk fuses expansion, the output gates, and
    stream compaction of outputs, history, and the next frontier (running
    offsets + fixed-width dynamic_update_slice whose garbage tail is
    overwritten by the next chunk's write)."""
    import jax.numpy as jnp
    from jax import lax

    cap, S = state["lo"].shape
    depth = state["depth"]
    nvalid = state["nvalid"]
    nchunks = (nvalid + CHUNK - 1) // CHUNK

    # per-level symbol mask: enforced prefix, then maxdepth cutoff
    sym_mask = jnp.ones(4, dtype=bool)
    if len(prefix_codes):
        pcs = jnp.asarray(prefix_codes, jnp.int32)
        enforced = pcs[jnp.minimum(depth, len(prefix_codes) - 1)]
        onehot = jnp.arange(4, dtype=jnp.int32) == enforced
        sym_mask = jnp.where(depth < len(prefix_codes), onehot, sym_mask)
    sym_mask = sym_mask & (depth < sc.maxdepth)

    # next-frontier buffers have 4*CHUNK slack rows so a full chunk write
    # at the running offset never clips
    nxt = dict(
        lo=jnp.zeros((cap + 4 * CHUNK, S), jnp.int32),
        hi=jnp.zeros((cap + 4 * CHUNK, S), jnp.int32),
        rlo=jnp.zeros((cap + 4 * CHUNK, S), jnp.int32),
    )

    def chunk_step(i, carry):
        (nxt, hist, out_freq, out_row, out_depth, child_off, oc, tp,
         emn, emx) = carry
        base = i * CHUNK
        lo_c = lax.dynamic_slice_in_dim(state["lo"], base, CHUNK)
        hi_c = lax.dynamic_slice_in_dim(state["hi"], base, CHUNK)
        rlo_c = lax.dynamic_slice_in_dim(state["rlo"], base, CHUNK)
        valid_c = (base + jnp.arange(CHUNK, dtype=jnp.int32)) < nvalid

        core = expand_core(dev_frows, dev_rrows, dev_soff, dev_C4,
                           lo_c, hi_c, rlo_c, valid_c, sc.fmin)
        union_child = (core["child_counts"] > 0) & sym_mask[None, :] \
            & valid_c[:, None]
        nactive = core["nactive"]
        numchildren = union_child.sum(axis=-1)
        single_idx = jnp.argmax(union_child, axis=-1)
        single_full = (numchildren == 1) & (
            jnp.take_along_axis(core["child_counts"], single_idx[..., None],
                                axis=-1)[..., 0] == nactive)

        # ---- output gates for this chunk's nodes (depth >= 1) ---------
        freq = core["freq"]
        active = freq > 0
        present = (nactive > 0) & valid_c & (depth >= 1)
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

        operm = jnp.argsort(jnp.logical_not(output), stable=True)
        k_out = output.sum(dtype=jnp.int32)
        out_freq = lax.dynamic_update_slice(out_freq, freq[operm], (oc, 0))
        out_row = lax.dynamic_update_slice(
            out_row, (base + jnp.arange(CHUNK, dtype=jnp.int32))[operm], (oc,))
        out_depth = lax.dynamic_update_slice(
            out_depth, jnp.full(CHUNK, depth, jnp.int32), (oc,))
        oc = oc + k_out

        stat_rows = present & ~((nactive == 1) & (sc.pmin > 1))
        emn = jnp.minimum(emn, jnp.where(stat_rows, ent32, np.inf).min())
        emx = jnp.maximum(emx, jnp.where(stat_rows, ent32, -np.inf).max())
        tp = tp + present.sum(dtype=jnp.int32)

        # ---- compact this chunk's children ------------------------------
        cv_flat = union_child.reshape(-1)                  # (CHUNK*4,)
        cperm = jnp.argsort(jnp.logical_not(cv_flat), stable=True)
        k_c = cv_flat.sum(dtype=jnp.int32)
        parent_loc = (cperm // 4).astype(jnp.int32)
        sym = (cperm % 4).astype(jnp.int32)

        clo_f = core["clo"].transpose(0, 2, 1).reshape(CHUNK * 4, S)
        chi_f = core["chi"].transpose(0, 2, 1).reshape(CHUNK * 4, S)
        crlo_f = core["crlo"].transpose(0, 2, 1).reshape(CHUNK * 4, S)
        cact_f = core["cactive"].transpose(0, 2, 1).reshape(CHUNK * 4, S)
        keep = cact_f[cperm]
        woff = jnp.minimum(child_off, cap)  # clip on overflow (redone)
        nxt = dict(
            lo=lax.dynamic_update_slice(
                nxt["lo"], jnp.where(keep, clo_f[cperm], 0), (woff, 0)),
            hi=lax.dynamic_update_slice(
                nxt["hi"], jnp.where(keep, chi_f[cperm], 0), (woff, 0)),
            rlo=lax.dynamic_update_slice(
                nxt["rlo"], jnp.where(keep, crlo_f[cperm], 0), (woff, 0)),
        )
        hoff = jnp.minimum(state["hist_len"] + child_off, HIST_CAP)
        hist = lax.dynamic_update_slice(
            hist, (base + parent_loc) * 4 + sym, (hoff,))
        return (nxt, hist, out_freq, out_row, out_depth, child_off + k_c,
                oc, tp, emn, emx)

    carry = (nxt, state["hist"], state["out_freq"], state["out_row"],
             state["out_depth"], jnp.asarray(0, jnp.int32), state["ocount"],
             state["total_paths"], state["ent_min"], state["ent_max"])
    (nxt, hist, out_freq, out_row, out_depth, child_count, oc, total_paths,
     ent_min, ent_max) = lax.fori_loop(0, nchunks, chunk_step, carry)

    grow = child_count > cap
    histfull = (state["hist_len"] + child_count > HIST_CAP) \
        | (state["nlev"] + 1 >= LVL_CAP)

    def redo(_):
        out = dict(state)
        out["flag"] = jnp.where(grow, FLAG_GROW, FLAG_HISTFULL
                                ).astype(jnp.int32)
        return out

    def advance(_):
        rowi = jnp.arange(cap, dtype=jnp.int32)
        live = (rowi < child_count)[:, None]
        flag = jnp.where(
            child_count == 0, FLAG_DONE,
            jnp.where((child_count <= sc.tail_width)
                      & (depth + 1 >= TAIL_MIN_DEPTH), FLAG_TAIL,
                      jnp.where(oc > sc.out_reserve, FLAG_DRAIN,
                                jnp.where((child_count * (2 * GROWTH) <= cap)
                                          & (cap > DEV_MIN_CAP),
                                          FLAG_SHRINK, FLAG_RUN)))
        ).astype(jnp.int32)
        return dict(
            lo=jnp.where(live, nxt["lo"][:cap], 0),
            hi=jnp.where(live, nxt["hi"][:cap], 0),
            rlo=jnp.where(live, nxt["rlo"][:cap], 0),
            nvalid=child_count, depth=depth + 1,
            hist=hist, hist_len=state["hist_len"] + child_count,
            lvl_len=lax.dynamic_update_slice(
                state["lvl_len"], child_count[None], (state["nlev"],)),
            nlev=state["nlev"] + 1,
            out_freq=out_freq, out_row=out_row, out_depth=out_depth,
            ocount=oc, total_paths=total_paths,
            ent_min=ent_min, ent_max=ent_max, flag=flag,
        )

    return lax.cond(grow | histfull, redo, advance, None)


@functools.cache
def _jitted_episode(cap: int, S: int, prefix_codes: tuple):
    import jax

    def run(frows, rrows, soff, C4, state, *flat_scalars):
        sc = _Scalars(*flat_scalars)

        def cond(st):
            return st["flag"] == FLAG_RUN

        def body(st):
            return _episode_body(frows, rrows, soff, C4, sc, prefix_codes, st)

        return jax.lax.while_loop(cond, body, state)

    return jax.jit(run, donate_argnums=(4,))


def _precompile_next(dev: DeviceIndexes, cap: int, prefix_codes: tuple,
                     sc: _Scalars) -> threading.Thread | None:
    """Compile the next capacity bucket's episode in a background thread
    while the current bucket mines, so a FLAG_GROW transition costs a
    (persistent-) cache hit instead of a full XLA compile."""
    if os.environ.get("DSM_PRECOMPILE", "1") != "1":
        return None
    import jax

    def shaped(x):
        return jax.ShapeDtypeStruct(x.shape, x.dtype)

    def work():
        try:
            state = jax.eval_shape(lambda: _seed_episode(dev, cap))
            fn = _jitted_episode(cap, dev.S, prefix_codes)
            fn.lower(shaped(dev.frows), shaped(dev.rrows), shaped(dev.soff),
                     shaped(dev.C4), state,
                     *[shaped(s) for s in sc.flat()]).compile()
        except Exception:  # pragma: no cover - best-effort warmup
            pass

    t = threading.Thread(target=work, daemon=True)
    t.start()
    return t


def _resize_state(state, cap: int):
    """Host-side pow2 re-bucketing of the frontier + output buffers."""
    import jax.numpy as jnp

    def pad_rows(a, rows):
        cur = a.shape[0]
        if rows == cur:
            return a
        if rows < cur:
            return a[:rows]
        return jnp.pad(a, ((0, rows - cur),) + ((0, 0),) * (a.ndim - 1))

    out = dict(state)
    for k in ("lo", "hi", "rlo"):
        out[k] = pad_rows(state[k], cap)
    ocap = OUT_RESERVE + cap + CHUNK
    for k in ("out_freq", "out_row", "out_depth"):
        out[k] = pad_rows(state[k], ocap)
    return out


def _pull_segment(ph: PathHistory, seg_depth0: int, state) -> None:
    """Pull the device's finished-level history into the host decoder and
    reset the device-side segment."""
    import jax
    import jax.numpy as jnp

    n = int(state["hist_len"])
    k = int(state["nlev"])
    if k:
        packed, lens = jax.device_get(
            (state["hist"][:n], state["lvl_len"][:k]))
        ph.add_segment(seg_depth0, packed, lens)
    state["hist_len"] = jnp.asarray(0, jnp.int32)
    state["nlev"] = jnp.asarray(0, jnp.int32)


def _drain(out: MinedOutput, cfg: MiningConfig, d: int, state,
           ph: PathHistory) -> None:
    """Pull output candidates, re-gate the entropy window in exact f64,
    and append formatted lines (ascending reader order).  The history
    covering every drained row must already be in `ph`."""
    import jax
    import jax.numpy as jnp

    n = int(state["ocount"])
    if n == 0:
        return
    freq, rows, depths = jax.device_get(
        (state["out_freq"][:n], state["out_row"][:n], state["out_depth"][:n]))
    state["ocount"] = jnp.asarray(0, jnp.int32)
    ent = node_entropy(freq.astype(np.int64), d)
    if cfg.emax > 0:
        ok = (ent >= cfg.emin) & (ent <= cfg.emax)
    else:
        ok = np.ones(n, dtype=bool)
    active = freq > 0
    keep = np.flatnonzero(ok)
    # decode paths grouped by depth (vectorized walk per group)
    paths: dict[int, list[bytes]] = {}
    order: dict[int, int] = {}
    for dep in np.unique(depths[keep]):
        grp = keep[depths[keep] == dep]
        paths[int(dep)] = ph.decode(int(dep), rows[grp])
        order[int(dep)] = 0
    for i in keep:
        dep = int(depths[i])
        path = paths[dep][order[dep]]
        order[dep] += 1
        act = np.flatnonzero(active[i])
        out.total_output += 1
        out.freq_histogram[act.size - 1] += 1
        occs = [(int(r), int(freq[i, r])) for r in act]
        out.total_occs += len(occs)
        out.lines.append((path, float(ent[i]), occs))


def _handoff_tail(indexes, cfg, prefix, out, state, ph: PathHistory,
                  debug=False) -> None:
    """FLAG_TAIL: pull the (narrow) frontier and finish on the host
    (engine_np.mine_from_level) — thousands of thin deep levels cost
    microseconds each there vs a full device step each here."""
    import jax

    from .engine_np import _Level, mine_from_level

    n = int(state["nvalid"])
    depth = int(state["depth"])
    lo, hi, rlo = jax.device_get(
        (state["lo"][:n], state["hi"][:n], state["rlo"][:n]))
    paths = ph.decode(depth, np.arange(n))
    level = _Level(paths=paths, lo=lo.astype(np.int64),
                   hi=hi.astype(np.int64), rlo=rlo.astype(np.int64))
    if debug:
        t0 = time.perf_counter()
    mine_from_level(indexes, cfg, level, depth, out, prefix=prefix)
    if debug:
        print(f"mine_device: host tail from depth {depth} width {n} "
              f"took {time.perf_counter() - t0:.2f}s",
              file=sys.stderr, flush=True)


def mine_device(
    indexes: list[FMIndex],
    cfg: MiningConfig,
    prefix: bytes = b"",
    dev: DeviceIndexes | None = None,
    cap: int = DEV_MIN_CAP,
    tail_width: int = TAIL_WIDTH,
    out_reserve: int = OUT_RESERVE,
    checkpoint: str | None = None,
) -> MinedOutput:
    """Mine with the device-resident episode loop (ascending reader
    order), handing narrow deep frontiers to the host wavefront.
    Output lines/stats match engine_np.mine_np exactly except
    smallest/largest-entropy diagnostics, which are f32-accurate for
    the device-emitted part.

    `checkpoint`: path to a snapshot written at every drain-type episode
    exit and resumed from automatically when the file exists
    (mining/checkpoint.py); `out_reserve` lowers the drain threshold
    (more frequent exits -> finer checkpoints)."""
    import jax.numpy as jnp

    cfg.validate()
    if dev is None:
        dev = DeviceIndexes.build(indexes)
    d = dev.S
    out = MinedOutput(freq_histogram=np.zeros(d, dtype=np.int64))
    sc = _Scalars.build(cfg, tail_width=tail_width,
                        out_reserve=min(out_reserve, OUT_RESERVE))
    prefix_codes = tuple(EXT_CHARS.index(b) for b in prefix)
    debug = os.environ.get("DSM_DEBUG") == "1"
    t0 = time.perf_counter()

    cap = _bucket(cap)
    state = _seed_episode(dev, cap)
    ph = PathHistory()
    seg_depth0 = 0
    if checkpoint is not None and os.path.exists(checkpoint):
        from .checkpoint import load_checkpoint

        host_state, out, base_paths = load_checkpoint(checkpoint, cfg,
                                                      prefix, dev.ns)
        cap = _bucket(max(int(host_state["nvalid"]), DEV_MIN_CAP))
        fresh = _seed_episode(dev, cap)
        for k, v in host_state.items():
            arr = jnp.asarray(v)
            if arr.ndim and k in ("lo", "hi", "rlo"):
                tgt = fresh[k]
                arr = arr[tuple(slice(0, t) for t in tgt.shape)]
                pads = [(0, t - s) for t, s in zip(tgt.shape, arr.shape)]
                arr = jnp.pad(arr, pads)
            fresh[k] = arr
        state = fresh
        state["flag"] = jnp.asarray(FLAG_RUN, jnp.int32)
        seg_depth0 = int(state["depth"])
        ph = PathHistory(base_depth=seg_depth0, base_paths=base_paths)
        if debug:
            print(f"mine_device: resumed depth={seg_depth0} "
                  f"nvalid={int(state['nvalid'])}", file=sys.stderr)

    def _save() -> None:
        if checkpoint is not None:
            from .checkpoint import save_checkpoint

            n = int(state["nvalid"])
            live_paths = ph.decode(int(state["depth"]), np.arange(n))
            save_checkpoint(checkpoint, state, out, cfg, prefix, dev.ns,
                            live_paths)

    _precompile_next(dev, cap * GROWTH, prefix_codes, sc)
    while True:
        fn = _jitted_episode(cap, dev.S, prefix_codes)
        state = fn(dev.frows, dev.rrows, dev.soff, dev.C4, state, *sc.flat())
        flag = int(state["flag"])
        if debug:
            print(f"mine_device: flag={flag} cap={cap} "
                  f"depth={int(state['depth'])} nvalid={int(state['nvalid'])}"
                  f" ocount={int(state['ocount'])} "
                  f"t={time.perf_counter() - t0:.1f}s",
                  file=sys.stderr, flush=True)
        if flag == FLAG_GROW:
            cap *= GROWTH
            state = _resize_state(state, cap)
            _precompile_next(dev, cap * GROWTH, prefix_codes, sc)
            state["flag"] = jnp.asarray(FLAG_RUN, jnp.int32)
            continue
        # every other exit pulls the finished levels (outputs reference them)
        _pull_segment(ph, seg_depth0, state)
        seg_depth0 = int(state["depth"])
        if flag == FLAG_DONE:
            _drain(out, cfg, d, state, ph)
            break
        if flag == FLAG_TAIL:
            _drain(out, cfg, d, state, ph)
            # fold device-side stats in BEFORE the host tail refines them
            out.total_paths += int(state["total_paths"])
            em, eM = float(state["ent_min"]), float(state["ent_max"])
            if np.isfinite(em):
                out.smallest_entropy = min(out.smallest_entropy, em)
            if np.isfinite(eM):
                out.largest_entropy = max(out.largest_entropy, eM)
            _handoff_tail(indexes, cfg, prefix, out, state, ph, debug=debug)
            if checkpoint is not None and os.path.exists(checkpoint):
                os.unlink(checkpoint)
            out.sort_postorder()
            return out
        if flag in (FLAG_DRAIN, FLAG_HISTFULL):
            _drain(out, cfg, d, state, ph)
            _save()
        elif flag == FLAG_SHRINK:
            # frontier is front-packed; safe to drop the all-zero tail
            _drain(out, cfg, d, state, ph)
            cap = _bucket(int(state["nvalid"]))
            state = _resize_state(state, cap)
            _save()
        state["flag"] = jnp.asarray(FLAG_RUN, jnp.int32)

    out.total_paths = int(state["total_paths"])
    em, eM = float(state["ent_min"]), float(state["ent_max"])
    out.smallest_entropy = em if np.isfinite(em) else 1000.0
    out.largest_entropy = eM if np.isfinite(eM) else -1000.0
    if checkpoint is not None and os.path.exists(checkpoint):
        os.unlink(checkpoint)
    out.sort_postorder()
    return out
