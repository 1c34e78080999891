"""Byte-exact output parity via gnu-order reader tracking.

Two layers, mirroring the reference's own test strategy (SURVEY.md §4):
randomized differential tests of the GnuHashSet model against a real
libstdc++ unordered_set<unsigned> (tests/cpp/uset_oracle.cpp), then
whole-pipeline byte comparison against the frozen reference goldens.
"""

import glob
import gzip
import os
import shutil
import subprocess

import numpy as np
import pytest

from dsm_tpu.index.alphabet import transform
from dsm_tpu.index.fasta import read_fasta
from dsm_tpu.index.fmindex import FMIndex
from dsm_tpu.mining.gnuorder import GnuHashSet, root_order

from test_parity import CONFIGS, GOLDEN, TOYDATA

HERE = os.path.dirname(os.path.abspath(__file__))


# ---------------------------------------------------------------- model layer
@pytest.fixture(scope="module")
def oracle_bin(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    out = tmp_path_factory.mktemp("uset") / "uset_oracle"
    subprocess.run(
        ["g++", "-O2", "-o", str(out), os.path.join(HERE, "cpp", "uset_oracle.cpp")],
        check=True,
    )
    return str(out)


def run_oracle(oracle_bin: str, sequences: list[list[int]]) -> list[list[int]]:
    ops = []
    for seq in sequences:
        ops.append("n")
        ops.extend(f"i {k}" for k in seq)
        ops.append("d")
    ops.append("q")
    res = subprocess.run([oracle_bin], input="\n".join(ops), text=True,
                         capture_output=True, check=True)
    orders = []
    for line in res.stdout.splitlines():
        parts = line.split()
        assert parts[0] == "o"
        orders.append([int(x) for x in parts[2:]])
    return orders


def model_order(seq: list[int]) -> list[int]:
    s = GnuHashSet()
    for k in seq:
        s.insert(k)
    return s.order()


def test_gnuhashset_differential(oracle_bin, rng):
    sequences = [list(range(d)) for d in (1, 2, 5, 13, 14, 29, 30, 273)]
    for trial in range(60):
        n = int(rng.integers(1, 700))
        hi = int(rng.integers(n, 4 * n + 2))
        seq = rng.choice(hi, size=n, replace=False).tolist()
        if trial % 3 == 0:  # duplicates must be no-ops
            seq = seq + seq[: n // 2]
        sequences.append([int(k) for k in seq])
    expected = run_oracle(oracle_bin, sequences)
    for seq, exp in zip(sequences, expected):
        assert model_order(seq) == exp, f"insert sequence {seq[:20]}..."


def test_root_order_small():
    # d=5: distinct buckets mod 13, each insert prepends
    assert root_order(5) == [4, 3, 2, 1, 0]


# --------------------------------------------------------------- output layer
@pytest.fixture(scope="module")
def indexes():
    idxs = []
    for path in sorted(glob.glob(os.path.join(TOYDATA, "toy*.fasta.gz"))):
        texts = [transform(rec.seq) for rec in read_fasta(path)]
        idxs.append(FMIndex.from_texts(texts))
    return idxs


def golden_bytes(config: str) -> bytes:
    data = b""
    for prefix in "ACGT":
        with gzip.open(
            os.path.join(GOLDEN, f"server-output.{config}.{prefix}.txt.gz")
        ) as f:
            data += f.read()
    return data


@pytest.mark.parametrize("config", list(CONFIGS))
def test_byte_exact_np(indexes, config):
    from dsm_tpu.mining.engine_np import mine_np

    out = mine_np(indexes, CONFIGS[config], reader_order="gnu")
    assert out.format_lines() == golden_bytes(config)


@pytest.mark.parametrize("config", list(CONFIGS))
def test_byte_exact_tpu(indexes, config):
    """Episode engine + post-hoc lazy gnu reconstruction
    (mining/gnulazy.py) vs the frozen reference goldens."""
    from dsm_tpu.mining.engine import mine_tpu

    out = mine_tpu(indexes, CONFIGS[config], reader_order="gnu")
    assert out.format_lines() == golden_bytes(config)


def test_byte_exact_tpu_level_legacy(indexes):
    """The retained per-level gnu tracker path still byte-matches."""
    from dsm_tpu.mining.engine import mine_tpu

    out = mine_tpu(indexes, CONFIGS["default"], reader_order="level-gnu")
    assert out.format_lines() == golden_bytes("default")


def test_byte_exact_tpu_per_prefix(indexes):
    """Per-prefix episode runs (enforcepath) in lazy gnu order must
    byte-match each server's own golden."""
    from dsm_tpu.mining.engine import mine_tpu

    for prefix in "AC":
        out = mine_tpu(indexes, CONFIGS["default"], prefix=prefix.encode(),
                       reader_order="gnu")
        with gzip.open(
            os.path.join(GOLDEN, f"server-output.default.{prefix}.txt.gz")
        ) as f:
            assert out.format_lines() == f.read(), f"prefix {prefix}"


def test_byte_exact_per_prefix(indexes):
    """Each per-prefix run (the real per-server topology, enforcepath
    style) must byte-match that server's own golden."""
    from dsm_tpu.mining.engine_np import mine_np

    for prefix in "AT":
        out = mine_np(indexes, CONFIGS["specific"], prefix=prefix.encode(),
                      reader_order="gnu")
        with gzip.open(
            os.path.join(GOLDEN, f"server-output.specific.{prefix}.txt.gz")
        ) as f:
            assert out.format_lines() == f.read(), f"prefix {prefix}"
