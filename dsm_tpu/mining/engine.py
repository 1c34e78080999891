"""TPU wavefront mining engine — the flagship compute path.

Replaces the reference's d client processes x recursive DFS x TCP trie
streams x lazy server merge (EnumerateQuery.cpp:151-238,
metaserver.cpp:269-486) with ONE level-synchronous breadth-first wavefront
over all samples at once:

  * All S per-sample FM-indexes live stacked on device:
    blocks (S, NB, 128) int8 BWT codes + occ (S, NB+1, SIGMA) int32 sampled
    counts.  A union-trie frontier is a dense table of per-(node, sample)
    BWT intervals (CAP, S) plus the reference's four left-extension
    intervals (CAP, S, 4) (EnumerateQuery.h:44-45).
  * One jitted step expands a whole level: batched occ for 10 positions x 4
    symbols per (node, sample) — the HuffWT::rank pointer-chase
    (HuffWT.h:66-83) becomes one block-row gather + lane-masked compare-sum
    on the VPU — then computes per-node leftChar codes
    (EnumerateQuery.cpp:77-103), the right-branching child statistics
    (metaserver.cpp:416-417), and compacts surviving children into the next
    frontier with a stable sort (no host round-trip for the search state).
  * The host loop only keeps path strings, float64 entropy/gates/output
    (shared with the NumPy oracle: engine_np.emit_level), and frontier
    capacity management (grow on overflow, shrink for narrow deep levels —
    static shapes for XLA, power-of-two buckets to bound recompiles).

The expansion/analysis/compaction cores below are shared with the
multi-device engine (parallel/engine_sharded.py), which shards the sample
axis over a mesh and turns the child-statistic reductions into psums —
the TPU-native equivalent of the reference's TCP trie-stream merge.

Frequencies f >= fmin pruning happens per sample exactly as the client
does (EnumerateQuery.cpp:186-190); activity propagates down paths because
pruned samples get zeroed intervals.  Output is byte-identical to
engine_np (differentially tested), which is byte-identical to the
reference pipeline (tests/test_parity.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..index.alphabet import EXT_CHARS, PAD, SIGMA
from ..index.fmindex import FMIndex
from ..ops.rank import BLOCK, LOG2_BLOCK
from .config import MiningConfig
from .engine_np import LC_N, LC_ZERO, MinedOutput, emit_level

MIN_CAP = 1024
EXT4 = (2, 3, 4, 6)  # codes of A, C, G, T (alphabet.EXT_CODES as a tuple)


@dataclass
class DeviceIndexes:
    """S per-sample occ tables stacked and padded onto one device."""

    S: int
    ns: np.ndarray        # (S,) int64 text lengths
    blocks: object        # jnp (S, NB, BLOCK) int8
    occ: object           # jnp (S, NB+1, SIGMA) int32
    C4: object            # jnp (S, 4) int32 — C[c] for c in A,C,G,T
    C4hi: object          # jnp (S, 4) int32 — C[c+1] (interval ends)

    @classmethod
    def build(cls, indexes: list[FMIndex], pad_to: int | None = None
              ) -> "DeviceIndexes":
        """Stack per-sample tables; optionally right-pad the sample axis to
        `pad_to` with inert dummy samples (single-terminator texts) so the
        axis divides a mesh dimension.  Dummies are never active (no
        A/C/G/T occurrences) and contribute exactly 0.0 to entropy."""
        import jax.numpy as jnp

        S_real = len(indexes)
        S = pad_to if pad_to is not None else S_real
        if S < S_real:
            raise ValueError("pad_to smaller than the number of samples")
        nb_max = max(idx.table.blocks.shape[0] for idx in indexes)
        blocks = np.full((S, nb_max, BLOCK), PAD, dtype=np.int8)
        occ = np.zeros((S, nb_max + 1, SIGMA), dtype=np.int32)
        C4 = np.zeros((S, 4), dtype=np.int32)
        C4hi = np.zeros((S, 4), dtype=np.int32)
        ns = np.zeros(S, dtype=np.int64)
        for s, idx in enumerate(indexes):
            nb = idx.table.blocks.shape[0]
            blocks[s, :nb] = idx.table.blocks
            occ[s, : nb + 1] = idx.table.occ
            occ[s, nb + 1:] = idx.table.occ[-1]  # counts are flat past n
            C4[s] = [idx.C[c] for c in EXT4]
            C4hi[s] = [idx.C[c + 1] for c in EXT4]
            ns[s] = idx.n
        for s in range(S_real, S):  # dummy: text "\0" — occ/C4 all zero
            blocks[s, 0, 0] = 0
            ns[s] = 1
        return cls(S=S, ns=ns, blocks=jnp.asarray(blocks),
                   occ=jnp.asarray(occ), C4=jnp.asarray(C4),
                   C4hi=jnp.asarray(C4hi))


def _occ4_sample(blocks_s, occ_s, pos_s):
    """occ(c, p) for the four extension symbols, one sample.

    blocks_s (NB, BLOCK) int8; occ_s (NB+1, SIGMA) int32; pos_s (Q,) int32
    prefix lengths -> (Q, 4) int32.  One block-row gather per query plus a
    lane-masked compare-sum per symbol (the Pallas variant lives in
    ops/rank_pallas.py).
    """
    import jax.numpy as jnp

    b = pos_s >> LOG2_BLOCK
    r = pos_s & (BLOCK - 1)
    rows = blocks_s[b]                               # (Q, BLOCK) gather
    base = occ_s[b][:, jnp.array(EXT4, dtype=jnp.int32)]   # (Q, 4)
    lane = jnp.arange(BLOCK, dtype=jnp.int32)
    mask = lane[None, :] < r[:, None]
    cnt = jnp.stack(
        [jnp.sum((rows == np.int8(c)) & mask, axis=1, dtype=jnp.int32)
         for c in EXT4], axis=1)
    return base + cnt


def expand_core(blocks, occ, C4, lo, hi, elo, ehi, valid, fmin):
    """Shared per-shard expansion: 4-way LF of the main + 4 left-extension
    intervals for every (node, sample), per-sample child activity, and the
    per-node leftChar codes.  Works on whatever sample shard `blocks/occ/
    C4/lo/...` hold (full set single-device; a mesh shard under shard_map).

    Returns a dict of local arrays:
      clo, chi (CAP, S, 4); celo, cehi (CAP, S, ext, sym); cactive
      (CAP, S, 4) bool; freq (CAP, S); lc (CAP, S) int8;
      nactive (CAP,) int32; child_counts (CAP, 4) int32.
    """
    import jax
    import jax.numpy as jnp

    CAP, S = lo.shape
    pos = jnp.concatenate([lo[:, :, None], hi[:, :, None], elo, ehi], axis=2)
    # (CAP, S, 10) -> occ for 4 symbols: (CAP, S, 10, 4)
    o = jax.vmap(
        lambda bs, os_, ps: _occ4_sample(bs, os_, ps.reshape(-1)).reshape(CAP, 10, 4),
        in_axes=(0, 0, 1), out_axes=1,
    )(blocks, occ, pos)
    child = C4[None, :, None, :] + o
    clo, chi = child[:, :, 0, :], child[:, :, 1, :]        # (CAP, S, 4)
    celo, cehi = child[:, :, 2:6, :], child[:, :, 6:10, :]  # (CAP, S, ext, sym)

    parent_active = (hi > lo) & valid[:, None]
    cfreq = jnp.maximum(chi - clo, 0)
    cactive = parent_active[:, :, None] & (cfreq >= fmin)   # (CAP, S, 4)
    # stale-keep empty ext intervals (EnumerateQuery.cpp:44-55)
    ext_ne = ehi > elo                                      # (CAP, S, 4)
    celo = jnp.where(ext_ne[:, :, :, None], celo, elo[:, :, :, None])
    cehi = jnp.where(ext_ne[:, :, :, None], cehi, ehi[:, :, :, None])

    freq = hi - lo
    # leftChar codes (EnumerateQuery.cpp:77-103)
    matches = ext_ne & (elo == lo[:, :, None]) & (ehi == hi[:, :, None])
    lc = jnp.where(
        matches.any(axis=2), jnp.argmax(matches, axis=2) + 2,
        jnp.where(ext_ne.any(axis=2), LC_N, LC_ZERO),
    ).astype(jnp.int8)

    return dict(
        clo=clo, chi=chi, celo=celo, cehi=cehi, cactive=cactive,
        freq=freq, lc=lc,
        nactive=(freq > 0).sum(axis=1, dtype=jnp.int32),
        child_counts=cactive.sum(axis=1, dtype=jnp.int32),
    )


def analyze_children(union_child, child_counts, nactive):
    """numchildren + the right-branching-violation flag
    (metaserver.cpp:416-417): exactly one distinct child symbol AND every
    active reader descends into it.  child_counts/nactive must already be
    global (psum'd) when samples are sharded."""
    import jax.numpy as jnp

    numchildren = union_child.sum(axis=-1)
    single_idx = jnp.argmax(union_child, axis=-1)
    single_full = (numchildren == 1) & (
        jnp.take_along_axis(child_counts, single_idx[..., None], axis=-1)[..., 0]
        == nactive
    )
    return single_full


def compact_children(union_child, core):
    """Select surviving children (u-major, A<C<G<T within a node) into the
    next frontier via a stable sort.  `union_child` must be globally
    consistent; the gathered state is per-shard.  Returns the next state
    plus parent_row/sym/child_count for host path bookkeeping."""
    import jax.numpy as jnp

    CAP = union_child.shape[0]
    S = core["clo"].shape[1]
    cv_flat = union_child.reshape(-1)                       # (CAP*4,)
    perm = jnp.argsort(jnp.logical_not(cv_flat), stable=True)
    child_count = cv_flat.sum()
    sel = perm[:CAP]
    parent_row = (sel // 4).astype(jnp.int32)
    sym = (sel % 4).astype(jnp.int32)
    valid_next = jnp.arange(CAP, dtype=jnp.int32) < child_count

    clo_f = core["clo"].transpose(0, 2, 1).reshape(CAP * 4, S)
    chi_f = core["chi"].transpose(0, 2, 1).reshape(CAP * 4, S)
    cact_f = core["cactive"].transpose(0, 2, 1).reshape(CAP * 4, S)
    celo_f = core["celo"].transpose(0, 3, 1, 2).reshape(CAP * 4, S, 4)
    cehi_f = core["cehi"].transpose(0, 3, 1, 2).reshape(CAP * 4, S, 4)
    keep = cact_f[sel] & valid_next[:, None]
    return dict(
        lo=jnp.where(keep, clo_f[sel], 0),
        hi=jnp.where(keep, chi_f[sel], 0),
        elo=celo_f[sel], ehi=cehi_f[sel], valid=valid_next,
        parent_row=parent_row, sym=sym, child_count=child_count,
    )


def _level_step_impl(blocks, occ, C4, lo, hi, elo, ehi, valid, fmin, sym_mask):
    """Single-device step: expand + analyze + compact one frontier level."""
    core = expand_core(blocks, occ, C4, lo, hi, elo, ehi, valid, fmin)
    union_child = (core["child_counts"] > 0) & sym_mask[None, :]   # (CAP, 4)
    single_full = analyze_children(union_child, core["child_counts"],
                                   core["nactive"])
    res = compact_children(union_child, core)
    res.update(freq=core["freq"], lc=core["lc"], single_full=single_full)
    return res


@functools.cache
def _jitted_level_step():
    import jax

    return jax.jit(_level_step_impl)


def _level_step(*args):
    return _jitted_level_step()(*args)


def _seed_state(dev: DeviceIndexes, cap: int):
    import jax.numpy as jnp

    S = dev.S
    lo = jnp.zeros((cap, S), dtype=jnp.int32)
    hi = jnp.zeros((cap, S), dtype=jnp.int32)
    hi = hi.at[0].set(jnp.asarray(dev.ns, dtype=jnp.int32))
    elo = jnp.zeros((cap, S, 4), dtype=jnp.int32)
    ehi = jnp.zeros((cap, S, 4), dtype=jnp.int32)
    elo = elo.at[0].set(dev.C4)
    ehi = ehi.at[0].set(dev.C4hi)
    valid = jnp.zeros(cap, dtype=bool).at[0].set(True)
    return lo, hi, elo, ehi, valid


def _resize(state, cap: int):
    import jax.numpy as jnp

    lo, hi, elo, ehi, valid = state
    cur = lo.shape[0]
    if cap == cur:
        return state
    if cap < cur:
        return tuple(a[:cap] for a in state)
    pad = cap - cur
    return (
        jnp.pad(lo, ((0, pad), (0, 0))),
        jnp.pad(hi, ((0, pad), (0, 0))),
        jnp.pad(elo, ((0, pad), (0, 0), (0, 0))),
        jnp.pad(ehi, ((0, pad), (0, 0), (0, 0))),
        jnp.pad(valid, (0, pad)),
    )


def _next_pow2(x: int) -> int:
    return 1 << max(x - 1, 1).bit_length()


def mine_tpu(
    indexes: list[FMIndex],
    cfg: MiningConfig,
    prefix: bytes = b"",
    reader_order: str = "ascending",
    dev: DeviceIndexes | None = None,
    cap: int = MIN_CAP,
    checkpoint: str | None = None,
) -> MinedOutput:
    """Mine the cross-sample union trie on the accelerator.

    Same semantics and output as engine_np.mine_np (enforcepath via
    `prefix`, all MiningConfig gates).  The default 'ascending' reader
    order dispatches to the device-resident episode loop
    (engine_device.mine_device — no per-level host round-trips), which
    also supports checkpoint/resume; reader_order='gnu' (byte-exact
    reference parity) keeps the per-level loop here, whose host emission
    drives the order tracker.
    """
    import jax.numpy as jnp

    cfg.validate()
    if reader_order == "ascending":
        from .engine_device import mine_device

        return mine_device(indexes, cfg, prefix=prefix, dev=dev, cap=cap,
                           checkpoint=checkpoint)
    if checkpoint is not None:
        raise ValueError("checkpointing requires reader_order='ascending'")
    if dev is None:
        dev = DeviceIndexes.build(indexes)
    d = dev.S
    out = MinedOutput(freq_histogram=np.zeros(d, dtype=np.int64))
    tracker = None
    if reader_order == "gnu":
        from .gnuorder import GnuOrderTracker

        tracker = GnuOrderTracker(d, server_prefix_len=max(1, len(prefix)))

    fmin = jnp.asarray(cfg.fmin, dtype=jnp.int32)
    masks = {
        "all": jnp.ones(4, dtype=bool),
        "none": jnp.zeros(4, dtype=bool),
    }
    for ci in range(4):
        masks[ci] = jnp.zeros(4, dtype=bool).at[ci].set(True)
    prefix_codes = [EXT_CHARS.index(b) for b in prefix]

    state = _seed_state(dev, cap)
    paths: list[bytes] = [b""]
    depth = 0

    while True:
        if depth >= cfg.maxdepth:
            sym_mask = masks["none"]
        elif depth < len(prefix_codes):
            sym_mask = masks[prefix_codes[depth]]
        else:
            sym_mask = masks["all"]

        res = _level_step(dev.blocks, dev.occ, dev.C4, *state, fmin, sym_mask)
        child_count = int(res["child_count"])
        if child_count > state[0].shape[0]:
            # frontier overflow: grow capacity and redo this level
            state = _resize(state, _next_pow2(child_count))
            continue

        if depth > 0:
            emit_level(
                out, cfg, d, depth,
                paths + [b""] * (state[0].shape[0] - len(paths)),
                np.asarray(res["freq"]).astype(np.int64),
                np.asarray(res["lc"]),
                np.asarray(res["single_full"]),
                tracker,
            )
        if child_count == 0:
            break

        parent_row = np.asarray(res["parent_row"][:child_count])
        sym = np.asarray(res["sym"][:child_count])
        if tracker is not None:
            child_act = np.asarray(
                res["hi"][:child_count] > res["lo"][:child_count])
            tracker.advance(
                depth, paths,
                [(int(u), int(c), child_act[j])
                 for j, (u, c) in enumerate(
                     zip(parent_row.tolist(), sym.tolist()))],
            )
        paths = [paths[u] + EXT_CHARS[c:c + 1]
                 for u, c in zip(parent_row.tolist(), sym.tolist())]
        state = (res["lo"], res["hi"], res["elo"], res["ehi"], res["valid"])
        # shrink toward the live width to keep deep narrow levels cheap
        want = max(MIN_CAP, _next_pow2(child_count))
        if want < state[0].shape[0]:
            state = _resize(state, want)
        depth += 1

    out.sort_postorder()
    return out
