"""Resident-device mining: the whole wavefront loop inside one XLA program.

The per-level engine (mining/engine.py) pays one host round-trip per trie
level — fatal when the chip sits behind a network tunnel and the trie is
hundreds of levels deep.  Here the entire reference pipeline
(EnumerateQuery DFS + metaserver merge/gates, metaserver.cpp:269-486)
becomes ONE jitted `lax.while_loop` episode, designed so that wall-clock
~= device-busy time:

  * frontier state — the bidirectional intervals (lo, hi, rlo), 3 int32
    per (node, sample) — lives in HBM across levels; each level runs as a
    fori_loop over CHUNK-row slices with a DYNAMIC trip count
    ceil(nvalid/CHUNK), so compute scales with the live frontier width,
    not the capacity;
  * capacity is FIXED per run at next_pow2(sum of text lengths) (the
    frontier can never exceed the number of distinct substrings of one
    length, which is bounded by the total text length), so the episode
    compiles exactly once and never pays grow/shrink exits — chunking
    makes the large buffers free, and a (rare) overflow of the CAP_MAX
    clamp still grows via FLAG_GROW;
  * the frontier is double-buffered: the while carry holds (cur, nxt)
    buffer pairs that SWAP roles each level, so advancing a level moves
    no data — stale rows beyond nvalid are masked by the chunk valid
    flags, never zeroed;
  * each chunk fuses expansion (4 fused-row ranks per node-sample,
    ops/rank.py), the output gates, and stream compaction of both the
    output rows and the next frontier (running offsets + fixed-width
    updates whose garbage tails the next chunk overwrites);
  * NO path strings are materialized on device AND the packed
    parent-pointer history (one int32 per child: parent_row*4 + sym) is
    never bulk-pulled: it stays device-resident, and the few paths the
    host needs (gated outputs, tail handoff, checkpoints) are decoded by
    an on-device ancestor walk (_decode_rows) that pulls only (rows,
    depth) bytes;
  * the cheap output gates the server applies (metaserver.cpp:403-417)
    are evaluated on device in the hot loop — depth window, pmin/pmax
    band, entropy window, right-branching — and passing rows are
    compacted into a device-resident output buffer as (level-row, depth,
    freqs, reverse-interval); the left-branching gate
    (metaserver.cpp:418-419) is deferred to drain time, where
    leftchar_codes runs on device for just the candidate rows — this
    halves the per-node rank traffic (2 forward positions instead of
    2 forward + 2 reverse);
  * the entropy window is gated in float32 with a safety margin; the
    host re-checks drained candidates in float64 with the reference's
    exact expression shapes (engine_np.node_entropy), so emitted lines
    are bit-identical to the oracle while the device never touches f64;
  * the episode exits only to report: completion, output-buffer pressure
    (host drains, resumes), history pressure (host drains outputs, pulls
    the finished levels into PathHistory, resets — the level is redone
    with no emission on the overflow branch, so no duplicates), frontier
    shrink past TAIL_WIDTH/TAIL_MIN_DEPTH (host wavefront finishes the
    deep thin tail where a numpy level costs less than a device step),
    or capacity overflow (only past the CAP_MAX clamp).

Host work per episode is O(drained outputs), not O(trie bytes).
Semantics are those of engine_np.mine_np in 'ascending' reader order;
byte-exact gnu-order runs use the per-level engine
(mine_tpu(reader_order='gnu')).

Entropy min/max *statistics* (stderr diagnostics in the reference,
metaserver.cpp:390-394,805-813) are tracked in float32 here; the output
lines themselves are exact.
"""

from __future__ import annotations

import functools
import os
import sys
import time
from dataclasses import dataclass

import numpy as np

from ..index.alphabet import EXT_CHARS
from ..index.fmindex import FMIndex
from .config import MiningConfig
from .engine import DeviceIndexes, expand_core, leftchar_codes
from .engine_np import LOG2, MinedOutput, node_entropy

CHUNK = 8192          # per-chunk rows: bounds the rank-gather intermediates
#                       and is the work granularity (compute scales with
#                       ceil(nvalid/CHUNK), not with the capacity)
DEV_MIN_CAP = CHUNK   # frontier buffers must hold >= one chunk
CAP_MAX = 1 << 22     # auto-capacity clamp; beyond this FLAG_GROW kicks in
GROWTH = 8            # capacity growth factor on (rare) overflow past CAP_MAX
OUT_RESERVE = 1 << 15  # drained-output buffer target size
LVL_CAP = 1 << 13      # per-segment level-offset slots
ENT_MARGIN = 1e-2      # f32 entropy gate slack; host re-gates in f64
DECODE_K = 4096        # rows per on-device path-decode dispatch
(FLAG_RUN, FLAG_DONE, FLAG_DRAIN, FLAG_GROW, FLAG_HISTFULL,
 FLAG_TAIL) = range(6)

# Hand the frontier to the host numpy wavefront once it is this narrow
# and past this depth: a TPU while-loop iteration costs ~the same for 2
# live rows as for a full chunk, and deep tries (long repeats) have
# thousands of near-empty levels — the reference's followOneBranch fast
# lane (EnumerateQuery.cpp:105-149) solves the same problem recursively.
TAIL_WIDTH = 768
TAIL_MIN_DEPTH = 12


def _next_pow2(x: int) -> int:
    return 1 << max(x - 1, 1).bit_length()


def _auto_cap(dev: DeviceIndexes, floor: int) -> int:
    """Fixed frontier capacity: every level's width is bounded by the
    number of distinct substrings of that length <= sum of text lengths,
    so next_pow2(sum n_s) never overflows (clamped to CAP_MAX)."""
    want = min(_next_pow2(int(dev.ns.sum()) + 1), CAP_MAX)
    return max(DEV_MIN_CAP, _next_pow2(floor), want)


def _hist_cap(dev: DeviceIndexes) -> int:
    """Device history sizing: one int32 per union-trie node.  Tries are
    typically a small multiple of the text length; 8x covers everything
    we have measured, and overflow degrades to a (pulled) FLAG_HISTFULL
    segment, never to an error.  The clamp spends up to 1 GiB of HBM —
    a bulk pull over the device tunnel costs far more than the memory
    (DSM_HIST_CAP overrides)."""
    env = os.environ.get("DSM_HIST_CAP")
    if env:
        return int(env)
    want = 8 * _next_pow2(int(dev.ns.sum()) + 1)
    return max(1 << 20, min(want, 1 << 28))


class PathHistory:
    """Host-side decoder for pulled parent-pointer history segments.

    Only FLAG_HISTFULL exits pull history off the device; in the common
    case this holds nothing and decoding happens on device.  Level d's
    entries (one int32 per node: parent_row*4 + sym, in frontier row
    order) map rows at depth d to (parent row at d-1, symbol); segments
    accumulate keyed by absolute depth.  base_paths seeds rows at
    base_depth (checkpoint resume)."""

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


def _seed_episode(dev: DeviceIndexes, cap: int, hist_cap: int | None = None):
    """Fresh episode state.  fr_lo/fr_hi/fr_rlo [2, rows, S] are the
    double-buffered frontier — `parity` selects the live half, levels
    read [p] and write [1-p], and committing a level just flips the
    scalar, so XLA updates every buffer in place (cap + 4*CHUNK rows so
    a full chunk write at a running offset never clips); hist/lvl_off
    are the device-resident parent-pointer history of the current
    segment."""
    import jax.numpy as jnp

    S = dev.S
    if hist_cap is None:
        hist_cap = _hist_cap(dev)
    rows = cap + 4 * CHUNK
    ocap = OUT_RESERVE + cap + CHUNK
    return dict(
        fr_lo=jnp.zeros((2, rows, S), jnp.int32),
        fr_hi=jnp.zeros((2, rows, S), jnp.int32).at[0, 0].set(
            jnp.asarray(dev.ns, jnp.int32)),
        fr_rlo=jnp.zeros((2, rows, S), jnp.int32),
        parity=jnp.asarray(0, jnp.int32),
        nvalid=jnp.asarray(1, jnp.int32),
        depth=jnp.asarray(0, jnp.int32),
        hist=jnp.zeros(hist_cap + 4 * CHUNK, jnp.int32),
        hist_len=jnp.asarray(0, jnp.int32),
        lvl_off=jnp.zeros(LVL_CAP, jnp.int32),
        nlev=jnp.asarray(0, jnp.int32),
        out_freq=jnp.zeros((ocap, S), jnp.int32),
        out_rlo=jnp.zeros((ocap, S), jnp.int32),
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
                  prefix_codes, hist_cap, state):
    """One trie level, processed in CHUNK-row slices with a DYNAMIC trip
    count: compute scales with the live frontier width (state["nvalid"]),
    not the capacity.  Each chunk fuses expansion, the output gates, and
    stream compaction of outputs, history, and the next frontier (running
    offsets + fixed-width dynamic_update_slice whose garbage tail is
    overwritten by the next chunk's write).  Advancing a level flips the
    frontier parity scalar; every array updates in place (no lax.cond —
    a redo only freezes the scalar counters, since all buffer writes land
    beyond the committed offsets and the redone level overwrites them)."""
    import jax.numpy as jnp
    from jax import lax

    _, rows_cap, S = state["fr_lo"].shape
    cap = rows_cap - 4 * CHUNK
    depth = state["depth"]
    nvalid = state["nvalid"]
    par = state["parity"]
    nchunks = (nvalid + CHUNK - 1) // CHUNK

    # per-level symbol mask: enforced prefix, then maxdepth cutoff
    sym_mask = jnp.ones(4, dtype=bool)
    if len(prefix_codes):
        pcs = jnp.asarray(prefix_codes, jnp.int32)
        enforced = pcs[jnp.minimum(depth, len(prefix_codes) - 1)]
        onehot = jnp.arange(4, dtype=jnp.int32) == enforced
        sym_mask = jnp.where(depth < len(prefix_codes), onehot, sym_mask)
    sym_mask = sym_mask & (depth < sc.maxdepth)

    def chunk_step(i, carry):
        (fr_lo, fr_hi, fr_rlo, hist, out_freq, out_rlo, out_row,
         out_depth, child_off, oc, tp, emn, emx) = carry
        base = i * CHUNK
        lo_c = lax.dynamic_slice(fr_lo, (par, base, 0), (1, CHUNK, S))[0]
        hi_c = lax.dynamic_slice(fr_hi, (par, base, 0), (1, CHUNK, S))[0]
        rlo_c = lax.dynamic_slice(fr_rlo, (par, base, 0), (1, CHUNK, S))[0]
        valid_c = (base + jnp.arange(CHUNK, dtype=jnp.int32)) < nvalid

        core = expand_core(dev_frows, dev_rrows, dev_soff, dev_C4,
                           lo_c, hi_c, rlo_c, valid_c, sc.fmin,
                           with_lc=False)
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
        ent32 = _entropy_f32(freq, nactive, S)
        egate = jnp.where(
            sc.use_egate,
            (ent32 >= sc.emin - ENT_MARGIN) & (ent32 <= sc.emax + ENT_MARGIN),
            True)
        output = (present & (depth >= sc.mindepth)
                  & (nactive >= sc.pmin)
                  & ((sc.pmax == 0) | (nactive <= sc.pmax))
                  & egate & ~single_full)
        # NOTE: the left-branching gate (lc_agg) is applied at drain
        # time on device for just these candidate rows (leftchar_codes
        # over out_rlo/out_freq) — skipping it here removes the two
        # reverse-index rank positions from the per-node hot loop

        operm = jnp.argsort(jnp.logical_not(output), stable=True)
        k_out = output.sum(dtype=jnp.int32)
        out_freq = lax.dynamic_update_slice(out_freq, freq[operm], (oc, 0))
        out_rlo = lax.dynamic_update_slice(out_rlo, rlo_c[operm], (oc, 0))
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
        wpar = 1 - par
        fr_lo = lax.dynamic_update_slice(
            fr_lo, jnp.where(keep, clo_f[cperm], 0)[None], (wpar, woff, 0))
        fr_hi = lax.dynamic_update_slice(
            fr_hi, jnp.where(keep, chi_f[cperm], 0)[None], (wpar, woff, 0))
        fr_rlo = lax.dynamic_update_slice(
            fr_rlo, jnp.where(keep, crlo_f[cperm], 0)[None], (wpar, woff, 0))
        hoff = jnp.minimum(state["hist_len"] + child_off, hist_cap)
        hist = lax.dynamic_update_slice(
            hist, (base + parent_loc) * 4 + sym, (hoff,))
        return (fr_lo, fr_hi, fr_rlo, hist, out_freq, out_rlo, out_row,
                out_depth, child_off + k_c, oc, tp, emn, emx)

    carry = (state["fr_lo"], state["fr_hi"], state["fr_rlo"], state["hist"],
             state["out_freq"], state["out_rlo"], state["out_row"],
             state["out_depth"], jnp.asarray(0, jnp.int32), state["ocount"],
             state["total_paths"], state["ent_min"], state["ent_max"])
    (fr_lo, fr_hi, fr_rlo, hist, out_freq, out_rlo, out_row, out_depth,
     child_count, oc, total_paths, ent_min, ent_max) = lax.fori_loop(
        0, nchunks, chunk_step, carry)

    grow = child_count > cap
    histfull = (state["hist_len"] + child_count > hist_cap) \
        | (state["nlev"] + 1 >= LVL_CAP)
    commit = ~(grow | histfull)
    flag = jnp.where(
        grow, FLAG_GROW,
        jnp.where(
            histfull, FLAG_HISTFULL,
            jnp.where(
                child_count == 0, FLAG_DONE,
                jnp.where((child_count <= sc.tail_width)
                          & (depth + 1 >= TAIL_MIN_DEPTH), FLAG_TAIL,
                          jnp.where(oc > sc.out_reserve, FLAG_DRAIN,
                                    FLAG_RUN))))).astype(jnp.int32)

    def keep_if(new, old):
        return jnp.where(commit, new, old)

    return dict(
        fr_lo=fr_lo, fr_hi=fr_hi, fr_rlo=fr_rlo,
        parity=keep_if(1 - par, par),
        nvalid=keep_if(child_count, nvalid),
        depth=keep_if(depth + 1, depth),
        hist=hist,
        hist_len=keep_if(state["hist_len"] + child_count,
                         state["hist_len"]),
        # always record this level's start offset at slot nlev: on a redo
        # nlev does not advance and the slot is simply overwritten
        lvl_off=lax.dynamic_update_slice(
            state["lvl_off"], state["hist_len"][None], (state["nlev"],)),
        nlev=keep_if(state["nlev"] + 1, state["nlev"]),
        out_freq=out_freq, out_rlo=out_rlo, out_row=out_row,
        out_depth=out_depth,
        ocount=keep_if(oc, state["ocount"]),
        total_paths=keep_if(total_paths, state["total_paths"]),
        ent_min=keep_if(ent_min, state["ent_min"]),
        ent_max=keep_if(ent_max, state["ent_max"]),
        flag=flag,
    )


@functools.cache
def _jitted_episode(cap: int, hist_cap: int, S: int, prefix_codes: tuple):
    import jax

    def run(frows, rrows, soff, C4, state, *flat_scalars):
        sc = _Scalars(*flat_scalars)

        def cond(st):
            return st["flag"] == FLAG_RUN

        def body(st):
            return _episode_body(frows, rrows, soff, C4, sc, prefix_codes,
                                 hist_cap, st)

        return jax.lax.while_loop(cond, body, state)

    return jax.jit(run, donate_argnums=(4,))


@functools.cache
def _jitted_decode(dcols: int):
    """On-device ancestor walk: rows at per-row relative levels `jvec`
    (1-based within the current history segment) walk down to the segment
    base, scattering one symbol per level into a (DECODE_K, dcols) int8
    matrix.  Pulls are O(rows * depth) bytes instead of the whole
    history."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def run(hist, lvl_off, rows, jvec):
        def body(_, carry):
            rows, jcur, syms = carry
            take = jcur >= 1
            off = jnp.where(take, lvl_off[jnp.maximum(jcur - 1, 0)], 0)
            e = jnp.where(take, hist[off + rows], 0)
            col = jnp.where(take, jcur - 1, dcols)  # dcols = OOB -> dropped
            syms = syms.at[jnp.arange(rows.shape[0]), col].set(
                (e & 3).astype(jnp.int8), mode="drop")
            rows = jnp.where(take, e >> 2, rows)
            return rows, jcur - 1, syms

        syms0 = jnp.zeros((rows.shape[0], dcols), jnp.int8)
        rows, _, syms = lax.fori_loop(0, dcols, body, (rows, jvec, syms0))
        return rows, syms

    return jax.jit(run)


def _decode_rows(state, ph: PathHistory, seg_depth0: int,
                 rows: np.ndarray, depths: np.ndarray) -> list[bytes]:
    """Paths for frontier `rows` at absolute `depths` (vectorized): the
    device walks each row to the current segment's base; PathHistory
    covers any earlier (pulled) segments and the checkpoint base."""
    import jax
    import jax.numpy as jnp

    rows = np.asarray(rows, dtype=np.int32)
    depths = np.asarray(depths, dtype=np.int32)
    m = rows.shape[0]
    if m == 0:
        return []
    jvec_all = depths - seg_depth0
    maxj = int(jvec_all.max(initial=0))
    if maxj == 0:
        return ph.decode(seg_depth0, rows)
    dcols = -(-maxj // 128) * 128
    fn = _jitted_decode(dcols)
    ext = np.frombuffer(EXT_CHARS, dtype=np.uint8)
    paths: list[bytes] = []
    for g0 in range(0, m, DECODE_K):
        grp = slice(g0, min(g0 + DECODE_K, m))
        k = grp.stop - grp.start
        r = np.zeros(DECODE_K, dtype=np.int32)
        j = np.zeros(DECODE_K, dtype=np.int32)
        r[:k] = rows[grp]
        j[:k] = jvec_all[grp]
        base_rows, syms = jax.device_get(fn(
            state["hist"], state["lvl_off"],
            jnp.asarray(r), jnp.asarray(j)))
        bases = ph.decode(seg_depth0, base_rows[:k])
        for i in range(k):
            paths.append(bases[i] + ext[syms[i, :jvec_all[g0 + i]]
                                        .astype(np.int64)].tobytes())
    return paths


def _pull_segment(ph: PathHistory, seg_depth0: int, state) -> None:
    """FLAG_HISTFULL fallback: pull the device's finished-level history
    into the host decoder and reset the device-side segment.  Any outputs
    referencing the segment must be drained (device-decoded) BEFORE this
    resets the offsets."""
    import jax
    import jax.numpy as jnp

    n = int(state["hist_len"])
    k = int(state["nlev"])
    if k:
        packed, offs = jax.device_get(
            (state["hist"][:n], state["lvl_off"][:k]))
        lens = np.diff(np.append(offs, n))
        ph.add_segment(seg_depth0, packed, lens)
    state["hist_len"] = jnp.asarray(0, jnp.int32)
    state["nlev"] = jnp.asarray(0, jnp.int32)


@functools.cache
def _jitted_lc():
    import jax

    return jax.jit(leftchar_codes)


def _drain(out: MinedOutput, cfg: MiningConfig, d: int, state,
           ph: PathHistory, seg_depth0: int, dev: DeviceIndexes) -> None:
    """Pull output candidates, apply the deferred left-branching gate
    (leftchar_codes on device for just these rows), re-gate the entropy
    window in exact f64, decode paths on device, and append formatted
    lines (ascending reader order)."""
    import jax
    import jax.numpy as jnp

    n = int(state["ocount"])
    if n == 0:
        return
    npad = min(_next_pow2(n), state["out_rlo"].shape[0])
    lc_dev = _jitted_lc()(dev.rrows, dev.soff,
                          state["out_rlo"][:npad], state["out_freq"][:npad])
    freq, rows, depths, lc = jax.device_get(
        (state["out_freq"][:n], state["out_row"][:n],
         state["out_depth"][:n], lc_dev[:n]))
    state["ocount"] = jnp.asarray(0, jnp.int32)
    ent = node_entropy(freq.astype(np.int64), d)
    if cfg.emax > 0:
        ok = (ent >= cfg.emin) & (ent <= cfg.emax)
    else:
        ok = np.ones(n, dtype=bool)
    active = freq > 0
    # left-branching gate (metaserver.cpp:418-419): concrete-base
    # aggregate leftChar (same code on every active reader) is rejected
    lc_min = np.where(active, lc, 99).min(axis=1)
    lc_max = np.where(active, lc, -1).max(axis=1)
    lc_agg = np.where(lc_min == lc_max, lc_max, 1)  # 1 == LC_N
    ok &= lc_agg < 2
    keep = np.flatnonzero(ok)
    paths = _decode_rows(state, ph, seg_depth0, rows[keep], depths[keep])
    for j, i in enumerate(keep):
        act = np.flatnonzero(active[i])
        out.total_output += 1
        out.freq_histogram[act.size - 1] += 1
        occs = [(int(r), int(freq[i, r])) for r in act]
        out.total_occs += len(occs)
        out.lines.append((paths[j], float(ent[i]), occs))


def _handoff_tail(indexes, cfg, prefix, out, state, ph: PathHistory,
                  seg_depth0: int, debug=False) -> None:
    """FLAG_TAIL: pull the (narrow) frontier and finish on the host
    (engine_np.mine_from_level) — thousands of thin deep levels cost
    microseconds each there vs a full device step each here."""
    import jax

    from .engine_np import _Level, mine_from_level

    n = int(state["nvalid"])
    depth = int(state["depth"])
    p = int(state["parity"])
    lo, hi, rlo = jax.device_get(
        (state["fr_lo"][p, :n], state["fr_hi"][p, :n],
         state["fr_rlo"][p, :n]))
    paths = _decode_rows(state, ph, seg_depth0, np.arange(n),
                         np.full(n, depth))
    level = _Level(paths=paths, lo=lo.astype(np.int64),
                   hi=hi.astype(np.int64), rlo=rlo.astype(np.int64))
    if debug:
        t0 = time.perf_counter()
    mine_from_level(indexes, cfg, level, depth, out, prefix=prefix)
    if debug:
        print(f"mine_device: host tail from depth {depth} width {n} "
              f"took {time.perf_counter() - t0:.2f}s",
              file=sys.stderr, flush=True)


def _resize_state(state, cap: int):
    """Rare safety path (frontier exceeded CAP_MAX): re-bucket the
    frontier + output buffers on device."""
    import jax.numpy as jnp

    def pad_rows(a, rows, axis=0):
        cur = a.shape[axis]
        if rows == cur:
            return a
        if rows < cur:
            return a.take(np.arange(rows), axis=axis)
        pads = [(0, 0)] * a.ndim
        pads[axis] = (0, rows - cur)
        return jnp.pad(a, pads)

    out = dict(state)
    for k in ("fr_lo", "fr_hi", "fr_rlo"):
        out[k] = pad_rows(state[k], cap + 4 * CHUNK, axis=1)
    ocap = OUT_RESERVE + cap + CHUNK
    for k in ("out_freq", "out_rlo", "out_row", "out_depth"):
        out[k] = pad_rows(state[k], ocap)
    return out


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

    `cap` is a floor; the actual fixed capacity is next_pow2(sum of text
    lengths) clamped to CAP_MAX, which no frontier can exceed, so the
    episode compiles once and runs without grow/resize exits.

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

    cap = _auto_cap(dev, cap)
    hist_cap = _hist_cap(dev)
    state = _seed_episode(dev, cap, hist_cap)
    ph = PathHistory()
    seg_depth0 = 0
    if checkpoint is not None and os.path.exists(checkpoint):
        from .checkpoint import load_checkpoint

        host_state, out, base_paths = load_checkpoint(checkpoint, cfg,
                                                      prefix, dev.ns)
        cap = _auto_cap(dev, max(int(host_state["nvalid"]), cap))
        fresh = _seed_episode(dev, cap, hist_cap)
        for k, v in host_state.items():
            arr = jnp.asarray(v)
            if arr.ndim and k in ("lo", "hi", "rlo"):
                # checkpointed frontier loads into parity half 0
                tgt = fresh["fr_" + k]
                arr = arr[tuple(slice(0, t) for t in tgt.shape[1:])]
                fresh["fr_" + k] = tgt.at[0, :arr.shape[0]].set(arr)
                continue
            fresh[k] = arr
        fresh["parity"] = jnp.asarray(0, jnp.int32)
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
            live_paths = _decode_rows(state, ph, seg_depth0, np.arange(n),
                                      np.full(n, int(state["depth"])))
            p = int(state["parity"])
            view = dict(state, lo=state["fr_lo"][p], hi=state["fr_hi"][p],
                        rlo=state["fr_rlo"][p])
            save_checkpoint(checkpoint, view, out, cfg, prefix, dev.ns,
                            live_paths)

    while True:
        fn = _jitted_episode(cap, hist_cap, dev.S, prefix_codes)
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
            state["flag"] = jnp.asarray(FLAG_RUN, jnp.int32)
            continue
        if flag == FLAG_DONE:
            _drain(out, cfg, d, state, ph, seg_depth0, dev)
            break
        if flag == FLAG_TAIL:
            _drain(out, cfg, d, state, ph, seg_depth0, dev)
            # fold device-side stats in BEFORE the host tail refines them
            out.total_paths += int(state["total_paths"])
            em, eM = float(state["ent_min"]), float(state["ent_max"])
            if np.isfinite(em):
                out.smallest_entropy = min(out.smallest_entropy, em)
            if np.isfinite(eM):
                out.largest_entropy = max(out.largest_entropy, eM)
            _handoff_tail(indexes, cfg, prefix, out, state, ph, seg_depth0,
                          debug=debug)
            if checkpoint is not None and os.path.exists(checkpoint):
                os.unlink(checkpoint)
            out.sort_postorder()
            return out
        if flag == FLAG_DRAIN:
            _drain(out, cfg, d, state, ph, seg_depth0, dev)
            _save()
        elif flag == FLAG_HISTFULL:
            # outputs reference the current segment: decode them first,
            # then pull the finished levels and reset the device segment
            _drain(out, cfg, d, state, ph, seg_depth0, dev)
            _pull_segment(ph, seg_depth0, state)
            seg_depth0 = int(state["depth"])
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
