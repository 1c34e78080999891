"""dsm-tpu benchmark — one JSON line for the driver.

Measures the headline metric from BASELINE.json: substrings (union-trie
paths) enumerated per second on a 5-sample mining run with the production
config (fmin=2, emax=1.2 — wrapper-SLURM defaults), end to end on the
accelerator JAX selects (the real TPU chip under the driver; CPU when
forced).

vs_baseline compares against the reference C++ pipeline (builder +
4x metaserver + 5x metaenumerate on localhost, the wrapper-SLURM
production topology) running the IDENTICAL dataset and config on this
machine's CPU.  The reference is compiled on demand into /tmp/refsrc-bench
(cached); if the toolchain or sources are unavailable the frozen
measurement in BENCH_BASELINE.json is used instead and noted in the
"baseline" field.

Scale knobs (env):
  DSM_BENCH_SCALE   dataset scale factor (default 100; toydata is scale 1)
  DSM_BENCH_SKIP_REF=1  never run the live reference (use frozen baseline)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

SCALE = int(os.environ.get("DSM_BENCH_SCALE", "100"))
WORK = f"/tmp/dsm_tpu_bench_s{SCALE}"
REF_SRC = "/root/reference"
REF_BIN = os.environ.get("DSM_REF_BIN", "/tmp/refsrc-bench")
BASELINE_FILE = os.path.join(HERE, "BENCH_BASELINE.json")

# production mining config (wrapper-SLURM/client-wrapper.sh --fmin 2,
# example-server.sh ENTROPY_CUTOFF=1.2)
SERVER_ARGS = ["--emax", "1.2"]
CLIENT_ARGS = ["--fmin", "2"]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_dataset() -> list[str]:
    datadir = os.path.join(WORK, "data")
    marker = os.path.join(datadir, ".complete")
    paths = [os.path.join(datadir, f"toy{s}.fasta") for s in range(5)]
    if not os.path.exists(marker):
        from tests.make_toydata import make_toydata

        os.makedirs(datadir, exist_ok=True)
        make_toydata(datadir, scale=SCALE)
        open(marker, "w").close()
    return paths


def build_indexes(fastas: list[str]):
    import jax

    from dsm_tpu.index.alphabet import transform
    from dsm_tpu.index.fasta import read_fasta
    from dsm_tpu.index.fmindex import FMIndex

    # construction runs on-accelerator (prefix-doubling over lax.sort,
    # ops/sa.py); the host path is the small-input/CI fallback
    backend = "numpy" if jax.default_backend() == "cpu" else "jax"
    idxs, secs = [], 0.0
    for path in fastas:
        cache = path + ".dtfmi"
        if os.path.exists(cache):
            idxs.append(FMIndex.load(cache))
            continue
        texts = [transform(rec.seq) for rec in read_fasta(path)]
        t0 = time.perf_counter()
        idx = FMIndex.from_texts(texts, names=[os.path.basename(path)],
                                 sa_backend=backend)
        secs += time.perf_counter() - t0
        idx.save(cache)
        idxs.append(idx)
    return idxs, secs


def run_ours(idxs):
    from dsm_tpu.mining.config import MiningConfig
    from dsm_tpu.mining.engine import DeviceIndexes, mine_tpu

    cfg = MiningConfig(fmin=2, emax=1.2)
    dev = DeviceIndexes.build(idxs)
    # full warmup run: compiles the (single, fixed-capacity) episode plus
    # the drain/decode/tail programs, so the timed run measures the
    # steady production state (persistent cache amortizes the compiles
    # across processes)
    mine_tpu(idxs, cfg, dev=dev)
    t0 = time.perf_counter()
    out = mine_tpu(idxs, cfg, dev=dev)
    wall = time.perf_counter() - t0
    return out, wall


def ref_binaries_ready() -> bool:
    return all(
        os.path.exists(os.path.join(REF_BIN, b))
        for b in ("builder", "metaenumerate", "metaserver")
    )


def build_reference() -> bool:
    if ref_binaries_ready():
        return True
    if not os.path.exists(os.path.join(REF_SRC, "Makefile")):
        return False
    try:
        if not os.path.exists(os.path.join(REF_BIN, "Makefile")):
            shutil.copytree(REF_SRC, REF_BIN, dirs_exist_ok=True)
        # serial make: the vendored recursive builds race under -j
        subprocess.run(
            ["make", "builder", "metaenumerate", "metaserver"],
            cwd=REF_BIN, check=True, capture_output=True, timeout=900,
        )
    except (subprocess.SubprocessError, OSError) as e:
        log(f"bench: reference build failed ({e}); using frozen baseline")
        return False
    return ref_binaries_ready()


def run_reference(fastas: list[str]) -> dict | None:
    """Time the reference pipeline; returns dict with wall seconds and
    total path count (sum of the four servers' 'Number of paths')."""
    datadir = os.path.dirname(fastas[0])
    samples = [os.path.basename(f)[: -len(".fasta")] for f in fastas]
    t0 = time.perf_counter()
    for f in fastas:
        if not os.path.exists(f + ".fmi"):
            subprocess.run([os.path.join(REF_BIN, "builder"), os.path.basename(f)],
                           cwd=datadir, check=True, capture_output=True)
    build_wall = time.perf_counter() - t0

    base_port = int(os.environ.get("DSM_BENCH_PORT", "54410"))
    names = ("\n".join(samples) + "\n").encode()
    servers, logs = [], []
    t0 = time.perf_counter()
    for i, prefix in enumerate("ACGT"):
        logf = os.path.join(WORK, f"ref-server.{prefix}.log")
        logs.append(logf)
        p = subprocess.Popen(
            [os.path.join(REF_BIN, "metaserver"), "-p", str(base_port + i),
             "-v", *SERVER_ARGS],  # -v: end-of-run counters on stderr
            stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
            stderr=open(logf, "wb"), cwd=datadir)
        p.stdin.write(names)
        p.stdin.close()
        servers.append(p)
    time.sleep(0.5)
    hostinfo = "".join(f"localhost {base_port + i} {p}\n"
                       for i, p in enumerate("ACGT")).encode()
    clients = []
    for s in samples:
        p = subprocess.Popen(
            [os.path.join(REF_BIN, "metaenumerate"), *CLIENT_ARGS,
             s + ".fasta.fmi"],
            stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL, cwd=datadir)
        p.stdin.write(hostinfo)
        p.stdin.close()
        clients.append(p)
    for p in clients + servers:
        if p.wait(timeout=3600) != 0:
            log(f"bench: reference process failed: {p.args}")
            return None
    mine_wall = time.perf_counter() - t0 - 0.5  # startup sleep is not mining

    paths = 0
    for logf in logs:
        with open(logf) as f:
            for line in f:
                if line.startswith("Number of paths:"):
                    paths += int(line.split(":")[1])
    return {"mine_wall_s": mine_wall, "build_wall_s": build_wall,
            "total_paths": paths}


def main() -> None:
    from dsm_tpu.utils.jaxsetup import setup_jax

    setup_jax()
    fastas = make_dataset()
    idxs, build_secs = build_indexes(fastas)
    import jax

    platform = jax.devices()[0].platform
    log(f"bench: scale={SCALE}, platform={platform}, "
        f"n={sum(i.n for i in idxs)} symbols indexed ({build_secs:.1f}s build)")

    out, wall = run_ours(idxs)
    ours_rate = out.total_paths / wall
    log(f"bench: ours  {out.total_paths} paths in {wall:.2f}s "
        f"-> {ours_rate:,.0f} paths/s ({out.total_output} reported)")

    ref = None
    if os.environ.get("DSM_BENCH_SKIP_REF") != "1" and build_reference():
        ref = run_reference(fastas)
    baseline_kind = "live-reference"
    if ref is None:
        baseline_kind = "frozen-reference"
        with open(BASELINE_FILE) as f:
            frozen = json.load(f)
        if frozen["scale"] != SCALE:
            raise SystemExit(f"frozen baseline is scale {frozen['scale']}, "
                             f"bench ran scale {SCALE}")
        ref = frozen["reference"]
    if not ref.get("total_paths"):
        raise SystemExit("bench: reference run produced no path counters")
    ref_rate = ref["total_paths"] / ref["mine_wall_s"]
    log(f"bench: ref   {ref['total_paths']} paths in {ref['mine_wall_s']:.2f}s "
        f"-> {ref_rate:,.0f} paths/s ({baseline_kind})")
    if ref["total_paths"] != out.total_paths:
        raise SystemExit(
            f"bench: path-count mismatch ours={out.total_paths} "
            f"ref={ref['total_paths']} — a perf number from a wrong "
            "traversal is meaningless, refusing to report one")

    print(json.dumps({
        "metric": "substrings_enumerated_per_s",
        "value": round(ours_rate, 1),
        "unit": "paths/s",
        "vs_baseline": round(ours_rate / ref_rate, 3),
        "detail": {
            "scale": SCALE,
            "platform": platform,
            "paths": out.total_paths,
            "reported": out.total_output,
            "mine_wall_s": round(wall, 3),
            "index_build_s": round(build_secs, 3),
            "baseline": baseline_kind,
            "ref_paths_per_s": round(ref_rate, 1),
        },
    }))


if __name__ == "__main__":
    main()
