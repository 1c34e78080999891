"""RLCSA artifact compatibility (VERDICT r4 missing #2).

`.rlcsa.array` is the reference's other index format
(TextCollection::load, TextCollection.cpp:27-62; incbwt/README:26-43).
The live half of this suite builds the reference's own `build_rlcsa`
tool (nibble-vector codec, the DSM root build's PSI_FLAGS) and checks
that FMIndex.load on its artifact indexes the same collection as our
builder — including a full mining-parity run.  The frozen half reads a
committed RLE-codec artifact (PSI_FLAGS= build) to pin the delta-code
fallback path.
"""

from __future__ import annotations

import os
import subprocess

import numpy as np
import pytest

from dsm_tpu.index import alphabet
from dsm_tpu.index.fmindex import FMIndex
from dsm_tpu.index.rlcsa import read_bwt
from dsm_tpu.mining.config import MiningConfig
from dsm_tpu.mining.engine_np import mine_np

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "data", "rlcsa")


@pytest.fixture(scope="session")
def build_rlcsa_bin():
    ref = os.environ.get("DSM_REF_BIN")
    if not ref or not os.path.isdir(os.path.join(ref, "incbwt")):
        pytest.skip("reference sources unavailable")
    tool = os.path.join(ref, "incbwt", "build_rlcsa")
    if not os.path.exists(tool):
        try:
            subprocess.run(["make", "build_rlcsa"],
                           cwd=os.path.join(ref, "incbwt"), check=True,
                           capture_output=True, timeout=600)
        except (subprocess.SubprocessError, OSError) as e:
            pytest.skip(f"cannot build build_rlcsa: {e}")
    return tool


def _line_texts(seed: int, k: int = 4) -> list[bytes]:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(k):
        n = int(rng.integers(80, 500))
        out.append(bytes(rng.choice(
            np.frombuffer(b"ACGTN", np.uint8), n)))
    return out


def _random_pattern_parity(idx: FMIndex, oracle: FMIndex,
                           texts: list[bytes], seed: int) -> None:
    rng = np.random.default_rng(seed)
    for _ in range(100):
        t = texts[int(rng.integers(0, len(texts)))]
        ln = int(rng.integers(1, 10))
        if len(t) <= ln:
            continue
        o = int(rng.integers(0, len(t) - ln))
        pat = t[o:o + ln]
        a, b = idx.search(pat), oracle.search(pat)
        assert a[1] - a[0] == b[1] - b[0], pat


def test_live_nibble_artifact(build_rlcsa_bin, tmp_path):
    texts = _line_texts(0xA11CE)
    seqfile = tmp_path / "coll"
    seqfile.write_bytes(b"\n".join(texts) + b"\n")
    subprocess.run([build_rlcsa_bin, str(seqfile), "10", "32"],
                   check=True, capture_output=True, timeout=300)
    idx = FMIndex.load(str(seqfile) + ".rlcsa.array")
    oracle = FMIndex.from_texts(
        [np.frombuffer(t, np.uint8) for t in texts])
    assert idx.n == oracle.n
    assert idx.number_of_texts == len(texts)
    # same collection content and rank structure
    assert sorted(t.tobytes() for t in idx.extract_texts()) \
        == sorted(t.tobytes() for t in oracle.extract_texts())
    np.testing.assert_array_equal(idx.table.counts, oracle.table.counts)
    _random_pattern_parity(idx, oracle, texts, 7)


def test_mining_on_rlcsa_matches_fmi_path(build_rlcsa_bin, tmp_path):
    """A mining run on RLCSA-loaded indexes equals the from_texts path
    (the VERDICT done-criterion)."""
    cfg = MiningConfig(fmin=2, emax=1.5)
    idxs_r, idxs_o = [], []
    for s in range(3):
        texts = _line_texts(900 + s, k=3)
        seqfile = tmp_path / f"s{s}"
        seqfile.write_bytes(b"\n".join(texts) + b"\n")
        subprocess.run([build_rlcsa_bin, str(seqfile), "10", "32"],
                       check=True, capture_output=True, timeout=300)
        idxs_r.append(FMIndex.load(str(seqfile) + ".rlcsa.array"))
        idxs_o.append(FMIndex.from_texts(
            [np.frombuffer(t, np.uint8) for t in texts]))
    out_r = mine_np(idxs_r, cfg)
    out_o = mine_np(idxs_o, cfg)
    assert out_r.format_lines() == out_o.format_lines()
    assert out_r.total_paths == out_o.total_paths


def test_frozen_rle_artifact():
    """Delta-code (RLEVector) fallback against a committed artifact
    produced by a PSI_FLAGS= build of build_rlcsa."""
    texts = [t.encode() for t in
             open(os.path.join(DATA, "seqs.txt")).read().split()]
    bwt, nseq, ends = read_bwt(
        os.path.join(DATA, "seqs-rle.rlcsa.array"))
    assert nseq == len(texts)
    oracle = FMIndex.from_texts(
        [np.frombuffer(t, np.uint8) for t in texts])
    dec = alphabet.encode(bwt)
    ours = np.asarray(oracle.table.blocks.reshape(-1)[:oracle.n])
    # identical per-symbol content; BWT bytes may permute inside
    # terminator-tie runs (RLCSA orders '\0' suffixes by sequence rank,
    # our suffix sort by concatenation position), which no pattern
    # interval can observe
    np.testing.assert_array_equal(np.bincount(dec, minlength=8),
                                  np.bincount(ours, minlength=8))
    idx = FMIndex.load(os.path.join(DATA, "seqs-rle.rlcsa.array"))
    assert idx.samplerate == 1  # from the sibling .parameters file
    _random_pattern_parity(idx, oracle, texts, 11)
    assert sorted(t.tobytes() for t in idx.extract_texts()) \
        == sorted(t.tobytes() for t in oracle.extract_texts())
