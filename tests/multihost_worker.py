"""Worker for tests/test_multihost.py: one simulated host.

Initializes jax.distributed against the shared coordinator, then mines
this host's owned prefix shards with the device episode engine on its
local (virtual CPU) devices and writes the formatted lines.
"""

import glob
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from dsm_tpu.index.alphabet import transform  # noqa: E402
from dsm_tpu.index.fasta import read_fasta  # noqa: E402
from dsm_tpu.index.fmindex import FMIndex  # noqa: E402
from dsm_tpu.mining.config import MiningConfig  # noqa: E402
from dsm_tpu.parallel import multihost  # noqa: E402


def main() -> int:
    pid, nproc, coord, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    multihost.initialize(coord, nproc, pid)
    assert jax.process_count() == nproc
    idxs = []
    for path in sorted(glob.glob(os.path.join(
            HERE, "data", "toydata", "toy*.fasta.gz"))):
        idxs.append(FMIndex.from_texts(
            [transform(rec.seq) for rec in read_fasta(path)]))
    cfg = MiningConfig(fmin=2, emax=1.2)
    out = multihost.mine_owned(idxs, cfg, nproc, pid)
    with open(outfile, "wb") as f:
        f.write(out.format_lines())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
