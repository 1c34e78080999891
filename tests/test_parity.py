"""Golden parity: the NumPy mining engine vs the compiled reference.

Goldens under tests/golden/ were frozen by tests/oracle.py running the
unmodified reference binaries (builder + metaenumerate + metaserver) on the
frozen toydata (tests/data/toydata), one metaserver per trie prefix A/C/G/T
as in wrapper-SLURM/example-server.sh.

Comparison is canonical-exact: per output line we require the same path,
the same printf("%f") entropy string, and the same {id:occ} set.  The
within-line reader order in the reference follows libstdc++
unordered_set iteration; 'gnu' order mode reproduces it byte-exactly
(tested separately in test_gnuorder.py once implemented).
"""

import glob
import gzip
import os

import numpy as np
import pytest

from dsm_tpu.index.alphabet import transform
from dsm_tpu.index.fasta import read_fasta
from dsm_tpu.index.fmindex import FMIndex
from dsm_tpu.mining.config import MiningConfig, UNLIMITED
from dsm_tpu.mining.engine_np import mine_np

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden")
TOYDATA = os.path.join(HERE, "data", "toydata")

# must mirror tests/oracle.py CONFIGS
CONFIGS = {
    "default": MiningConfig(fmin=2, emax=1.2),
    "specific": MiningConfig(fmin=5, emax=10, pmin=1, pmax=1),
    "wide": MiningConfig(fmin=2, emax=99),
    "filtered": MiningConfig(fmin=2, emax=1.5, emin=0.4, pmin=2, pmax=4,
                             mindepth=8),
    "shallow": MiningConfig(fmin=2, emax=1.2, maxdepth=12),
    "deep1": MiningConfig(fmin=7, emax=99, pmin=1),
}


@pytest.fixture(scope="module")
def indexes():
    idxs = []
    for path in sorted(glob.glob(os.path.join(TOYDATA, "toy*.fasta.gz"))):
        texts, names = [], []
        for rec in read_fasta(path):
            texts.append(transform(rec.seq))
            names.append(rec.name)
        idxs.append(FMIndex.from_texts(texts, names))
    assert len(idxs) == 5
    return idxs


def parse_lines(data: bytes):
    """-> list of (path, entropy_str, frozenset of (id, occ))."""
    rows = []
    for line in data.decode().splitlines():
        parts = line.split(" ")
        path, ent = parts[0], parts[1]
        occs = frozenset(
            (int(p.split(":")[0]), int(p.split(":")[1])) for p in parts[2:]
        )
        rows.append((path, ent, occs))
    return rows


def load_golden(config: str):
    rows = []
    for prefix in "ACGT":
        with gzip.open(
            os.path.join(GOLDEN, f"server-output.{config}.{prefix}.txt.gz"), "rb"
        ) as f:
            rows.extend(parse_lines(f.read()))
    return rows


@pytest.mark.parametrize("config", list(CONFIGS))
def test_parity(indexes, config):
    golden = load_golden(config)
    out = mine_np(indexes, CONFIGS[config])
    mine = parse_lines(out.format_lines())
    assert len(mine) == len(golden), (
        f"{config}: {len(mine)} lines vs golden {len(golden)}"
    )
    n_ent_diff = 0
    for i, (g, m) in enumerate(zip(golden, mine)):
        assert m[0] == g[0], f"{config} line {i}: path {m[0]} != {g[0]}"
        assert m[2] == g[2], f"{config} line {i} ({g[0]}): occs {m[2]} != {g[2]}"
        if m[1] != g[1]:
            n_ent_diff += 1
            # summation-order ULP tolerance pending gnu-order mode
            assert abs(float(m[1]) - float(g[1])) < 1e-9, (
                f"{config} line {i} ({g[0]}): entropy {m[1]} != {g[1]}"
            )
    assert n_ent_diff == 0, (
        f"{config}: {n_ent_diff} entropy strings differ (summation order)"
    )
