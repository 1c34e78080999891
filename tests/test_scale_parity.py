"""Fresh-seed, at-scale line parity vs the LIVE reference binaries.

VERDICT r3 #8: the frozen goldens pin scale-1 behaviour; this promotes
the /verify recipe into CI — generate data the goldens never saw (a
different seed, scale 10), run the compiled reference pipeline
(4 metaservers + 5 metaenumerate) AND the episode engine in gnu reader
order, and diff the output BYTE FOR BYTE.  Any gate, entropy-format or
ordering drift at scale fails here even though path counts agree.

Skips only when the reference cannot be built (conftest builds it on
demand on any host with the toolchain).
"""

import glob
import os
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import oracle  # noqa: E402  (tests/oracle.py)
from make_toydata import make_toydata  # noqa: E402

SCALE = int(os.environ.get("DSM_SCALE_PARITY_SCALE", "10"))
FRESH_SEED = 0xBEEF01


def _ref_available() -> bool:
    return all(os.path.exists(os.path.join(oracle.REF_BIN, b))
               for b in ("builder", "metaenumerate", "metaserver"))


@pytest.fixture(scope="module")
def fresh_run(tmp_path_factory):
    if not _ref_available():
        pytest.skip("reference binaries not built")
    datadir = str(tmp_path_factory.mktemp(f"fresh_s{SCALE}"))
    outdir = str(tmp_path_factory.mktemp("refout"))
    make_toydata(datadir, scale=SCALE, seed=FRESH_SEED)
    oracle.run_pipeline(datadir, outdir, "default", base_port=53490)
    ref_bytes = b""
    for prefix in "ACGT":
        with open(os.path.join(outdir,
                               f"server-output.default.{prefix}.txt"),
                  "rb") as f:
            ref_bytes += f.read()
    paths = 0
    for prefix in "ACGT":
        with open(os.path.join(outdir,
                               f"server.default.{prefix}.log")) as f:
            for line in f:
                if line.startswith("Number of paths:"):
                    paths += int(line.split(":")[1])
    return datadir, ref_bytes, paths


def test_fresh_seed_scale_line_parity(fresh_run):
    from dsm_tpu.index.alphabet import transform
    from dsm_tpu.index.fasta import read_fasta
    from dsm_tpu.index.fmindex import FMIndex
    from dsm_tpu.mining.config import MiningConfig
    from dsm_tpu.mining.engine import mine_tpu

    datadir, ref_bytes, ref_paths = fresh_run
    idxs = []
    for path in sorted(glob.glob(os.path.join(datadir, "toy*.fasta"))):
        idxs.append(FMIndex.from_texts(
            [transform(rec.seq) for rec in read_fasta(path)]))
    out = mine_tpu(idxs, MiningConfig(fmin=2, emax=1.2),
                   reader_order="gnu")
    got = out.format_lines()
    if got != ref_bytes:
        ours = got.splitlines()
        ref = ref_bytes.splitlines()
        for i, (a, b) in enumerate(zip(ours, ref)):
            assert a == b, (f"first differing line {i}:\n"
                            f"  ours: {a[:200]!r}\n  ref:  {b[:200]!r}")
        assert len(ours) == len(ref), (len(ours), len(ref))
    # the 4 servers' "Number of paths" counters sum to the union-trie
    # node count (the relation bench.py has asserted since r2)
    assert out.total_paths == ref_paths
