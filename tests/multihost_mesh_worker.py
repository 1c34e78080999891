"""Worker for the GLOBAL samples-mesh multihost test: one simulated host
of a 2-process jax.distributed run whose ('samples',) mesh spans BOTH
processes' devices, so the episode's per-level psums/all-gathers really
cross the process boundary (the DCN path on hardware) — the first actual
execution of mine_device_sharded across hosts (VERDICT r3 missing #1).

Each process holds 2 virtual CPU devices -> a 4-shard global mesh; both
processes must emit identical full output (drains ride replicated
all-gathers in multi-controller mode).
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
from dsm_tpu.parallel.engine_episode import mine_device_sharded  # noqa: E402


def main() -> int:
    pid, nproc, coord, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    reader_order = sys.argv[5] if len(sys.argv) > 5 else "ascending"
    multihost.initialize(coord, nproc, pid)
    assert jax.process_count() == nproc
    mesh = multihost.global_samples_mesh()
    assert len(mesh.devices.flat) == 2 * nproc, "mesh must span all hosts"
    idxs = []
    for path in sorted(glob.glob(os.path.join(
            HERE, "data", "toydata", "toy*.fasta.gz"))):
        idxs.append(FMIndex.from_texts(
            [transform(rec.seq) for rec in read_fasta(path)]))
    cfg = MiningConfig(fmin=2, emax=1.2)
    out = mine_device_sharded(idxs, cfg, mesh=mesh,
                              reader_order=reader_order)
    with open(outfile, "wb") as f:
        f.write(out.format_lines())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
