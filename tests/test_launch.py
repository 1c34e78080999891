"""Orchestration: dsm launch runs a full localhost fleet.

Local mode spawns our serve/enumerate subprocesses with the reference's
discovery-file wiring and must reproduce the frozen goldens; mixed mode
points the server side at the reference metaserver binary.
"""

import glob
import gzip
import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
GOLDEN = os.path.join(HERE, "golden")
TOYDATA = os.path.join(HERE, "data", "toydata")
REF_BIN = os.environ.get("DSM_REF_BIN", "/tmp/refsrc")
ENV = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO}


@pytest.fixture(scope="module")
def indexes(tmp_path_factory):
    out = tmp_path_factory.mktemp("launch_idx")
    paths = []
    for fa in sorted(glob.glob(os.path.join(TOYDATA, "toy*.fasta.gz"))):
        name = os.path.basename(fa)[: -len(".fasta.gz")]
        dst = str(out / (name + ".dsmi"))
        p = subprocess.run(
            [sys.executable, "-m", "dsm_tpu", "build", fa, "-o", dst],
            env=ENV, cwd=REPO, capture_output=True)
        assert p.returncode == 0, p.stderr.decode()
        paths.append(dst)
    return paths


def golden(config: str, prefix: str) -> bytes:
    with gzip.open(os.path.join(
            GOLDEN, f"server-output.{config}.{prefix}.txt.gz")) as f:
        return f.read()


def test_launch_local(indexes, tmp_path):
    p = subprocess.run(
        [sys.executable, "-m", "dsm_tpu", "launch", "--mode", "local",
         "--tmpdir", str(tmp_path / "tmp"), "--outdir", str(tmp_path / "out"),
         "--base-port", "53470", "-E", "1.2", "-f", "2", *indexes],
        env=ENV, cwd=REPO, capture_output=True, timeout=600)
    assert p.returncode == 0, p.stderr.decode()
    for prefix in "ACGT":
        got = open(tmp_path / "out" / f"server-output.{prefix}.txt",
                   "rb").read()
        assert got == golden("default", prefix), f"prefix {prefix}"


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_BIN, "metaserver")),
    reason="reference not built")
def test_launch_mixed_reference_server(indexes, tmp_path):
    """Our clients, reference servers — but reference metaserver can't
    load .dsmi, so the mixed direction here is reference SERVER + our
    client (index format stays ours on the client side)."""
    p = subprocess.run(
        [sys.executable, "-m", "dsm_tpu", "launch", "--mode", "local",
         "--tmpdir", str(tmp_path / "tmp"), "--outdir", str(tmp_path / "out"),
         "--base-port", "53480", "-E", "1.2", "-f", "2",
         "--server-cmd", os.path.join(REF_BIN, "metaserver"), *indexes],
        env=ENV, cwd=REPO, capture_output=True, timeout=600)
    assert p.returncode == 0, p.stderr.decode()
    for prefix in "ACGT":
        got = open(tmp_path / "out" / f"server-output.{prefix}.txt",
                   "rb").read()
        assert got == golden("default", prefix), f"prefix {prefix}"


def test_launch_slurm_emission(indexes, tmp_path):
    p = subprocess.run(
        [sys.executable, "-m", "dsm_tpu", "launch", "--mode", "slurm",
         "--tmpdir", str(tmp_path / "tmp"), "--outdir", str(tmp_path / "out"),
         "--hash-depth", "2", *indexes],
        env=ENV, cwd=REPO, capture_output=True, timeout=600)
    assert p.returncode == 0, p.stderr.decode()
    scripts = p.stdout.decode().splitlines()
    assert len(scripts) == 16 + 5  # 4**2 servers + 5 clients
    body = open(scripts[0]).read()
    assert "metaserver_config_AA.txt" in body and "sbatch" not in body
