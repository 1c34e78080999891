"""Differential tests of the index core against brute force.

Modeled on the reference's randomized differential testers
(libcds/tests/static_bitsequence_tester.cpp:66-120): replay every query
against a naive model of the same data.
"""

import numpy as np
import pytest

from dsm_tpu.index import alphabet
from dsm_tpu.index.fasta import parse_fasta
from dsm_tpu.index.fmindex import FMIndex
from dsm_tpu.ops.rank import BLOCK, OccTable, occ_prefix_np
from dsm_tpu.ops.sa import bwt_from_sa, suffix_array_np


def brute_suffix_array(s: np.ndarray) -> np.ndarray:
    suffixes = [bytes(s[i:].tobytes()) for i in range(len(s))]
    return np.array(sorted(range(len(s)), key=lambda i: suffixes[i]), dtype=np.int64)


def test_transform_matches_reference_recipe():
    # builder.cpp:183-201: normalize; append '-' + revcomp; reverse all
    out = alphabet.transform(b"acgTNx")
    # normalize -> ACGTNN ; revcomp -> NNACGT ; concat -> ACGTNN-NNACGT
    # reversed -> TGCANN-NNTGCA
    assert out.tobytes() == b"TGCANN-NNTGCA"


def test_normalize_keeps_solid_symbols():
    assert alphabet.normalize(b"01a23.zC").tobytes() == b"01A23.NC"


def test_fasta_parsing_reference_semantics():
    import io

    fp = io.BytesIO(
        b">  name1 rest of title\nACGT\nacgt\n>\nGGGG\n>name3\n\n>name4\nTTTT\n"
    )
    recs = list(parse_fasta(fp))
    # record with empty text (name3) is skipped; empty name becomes str(i-2)
    assert [(r.name, r.seq) for r in recs] == [
        ("name1", b"ACGTacgt"),
        ("0", b"GGGG"),
        ("name4", b"TTTT"),
    ]


@pytest.mark.parametrize("n", [1, 2, 7, 128, 129, 1000])
def test_suffix_array_matches_brute(rng, n):
    codes = rng.integers(0, 5, size=n).astype(np.int8)
    sa = suffix_array_np(codes)
    assert np.array_equal(sa, brute_suffix_array(codes))


def test_suffix_array_jax_matches_np(rng):
    from dsm_tpu.ops.sa import suffix_array_jax

    for n in [1, 2, 400, 1000]:
        codes = rng.integers(0, 5, size=n).astype(np.int8)
        assert np.array_equal(
            np.asarray(suffix_array_jax(codes)), suffix_array_np(codes)
        )


def test_occ_table_differential(rng):
    n = 5 * BLOCK + 37
    bwt = rng.integers(0, 7, size=n).astype(np.int8)
    table = OccTable.build(bwt)
    q = 2000
    syms = rng.integers(0, 8, size=q).astype(np.int8)
    pos = rng.integers(0, n + 1, size=q).astype(np.int64)
    got = occ_prefix_np(table, syms, pos)
    want = np.array([(bwt[:p] == s).sum() for s, p in zip(syms, pos)])
    assert np.array_equal(got, want)


def test_occ_batch_jax_matches_np(rng):
    import jax.numpy as jnp

    from dsm_tpu.ops.rank import occ_batch

    n = 3 * BLOCK + 5
    bwt = rng.integers(0, 7, size=n).astype(np.int8)
    table = OccTable.build(bwt)
    q = 512
    syms = rng.integers(0, 8, size=q).astype(np.int8)
    pos = rng.integers(0, n + 1, size=q).astype(np.int32)
    got = occ_batch(jnp.asarray(table.blocks), jnp.asarray(table.occ),
                    jnp.asarray(syms), jnp.asarray(pos))
    want = occ_prefix_np(table, syms, pos)
    assert np.array_equal(np.asarray(got), want)


def _count_brute(texts: list[bytes], pattern: bytes) -> int:
    # occurrences across the collection: each text followed by '\0'
    total = 0
    for t in texts:
        s = t + b"\x00"
        start = 0
        while True:
            i = s.find(pattern, start)
            if i < 0:
                break
            total += 1
            start = i + 1
    return total


def test_fmindex_count_matches_brute(rng):
    texts = []
    for _ in range(3):
        n = int(rng.integers(50, 300))
        texts.append(bytes(np.frombuffer(b"ACGT", dtype=np.uint8)[
            rng.integers(0, 4, size=n)].tobytes()))
    idx = FMIndex.from_texts([np.frombuffer(t, dtype=np.uint8) for t in texts])
    assert idx.check()
    for _ in range(100):
        plen = int(rng.integers(1, 8))
        pat = bytes(np.frombuffer(b"ACGT", dtype=np.uint8)[
            rng.integers(0, 4, size=plen)].tobytes())
        assert idx.count(pat) == _count_brute(texts, pat), pat


def test_fmindex_save_load_roundtrip(tmp_path, rng):
    texts = [np.frombuffer(b"ACGTACGTNNGG", dtype=np.uint8)]
    idx = FMIndex.from_texts(texts, names=["t0"])
    p = str(tmp_path / "x.dsmi")
    idx.save(p)
    idx2 = FMIndex.load(p)
    assert idx2.n == idx.n
    assert idx2.names == ["t0"]
    assert np.array_equal(idx2.table.blocks, idx.table.blocks)
    assert np.array_equal(idx2.table.occ, idx.table.occ)
    assert idx2.check()


def test_lf_ref_convention():
    # LF(c, -1) must equal C[c] (rank(c, -1) == 0; BitRank.cpp:191-195)
    idx = FMIndex.from_texts([np.frombuffer(b"ACGTACGT", dtype=np.uint8)])
    for c in range(8):
        assert idx.lf_ref(c, -1) == int(idx.C[c])
    # sum over full-range intervals covers n (the --check invariant)
    assert idx.check()


def test_locate_and_positions(rng):
    """SA-sample locate/get_position/occurrences vs brute force."""
    from dsm_tpu.index.alphabet import transform
    from dsm_tpu.index.fmindex import FMIndex

    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    raw = [bases[rng.integers(0, 4, size=int(rng.integers(40, 120)))].tobytes()
           for _ in range(9)]
    texts = [transform(t) for t in raw]
    idx = FMIndex.from_texts(texts, samplerate=16, sample_sa=True)

    # brute-force concatenation for ground truth
    concat = b"".join(bytes(t) + b"\x00" for t in texts)
    starts, s = [], 0
    for t in texts:
        starts.append(s)
        s += len(t) + 1

    for _ in range(25):
        tsel = int(rng.integers(0, 9))
        off = int(rng.integers(0, max(1, len(texts[tsel]) - 8)))
        pat = bytes(texts[tsel][off:off + 8])
        if b"\x00" in pat or len(pat) < 4:
            continue
        occs = idx.occurrences(pat)
        want = []
        p = concat.find(pat)
        while p != -1:
            doc = max(i for i, st in enumerate(starts) if st <= p)
            want.append((doc, p - starts[doc]))
            p = concat.find(pat, p + 1)
        assert occs == sorted(want), pat
        docs = idx.reads_containing(pat)
        assert docs == sorted({d for d, _ in want})

    # save/load round-trips the samples
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "x.dsmi")
        idx.save(path)
        back = FMIndex.load(path)
        assert back.sa_samples is not None
        pat = bytes(texts[0][:6])
        assert back.occurrences(pat) == idx.occurrences(pat)
