"""End-to-end CLI tests: `python -m dsm_tpu <cmd>` against frozen goldens.

The serve/enumerate pair is exercised as real subprocesses over
localhost, replicating the reference topology on the frozen toydata, and
diffed byte-for-byte against the goldens (which were produced by the
reference binaries).
"""

import glob
import gzip
import os
import subprocess
import sys
import time

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
GOLDEN = os.path.join(HERE, "golden")
TOYDATA = os.path.join(HERE, "data", "toydata")
ENV = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO}


def dsm(*args, **kw):
    return subprocess.run([sys.executable, "-m", "dsm_tpu", *args],
                          env=ENV, cwd=REPO, **kw)


@pytest.fixture(scope="module")
def built_indexes(tmp_path_factory):
    out = tmp_path_factory.mktemp("cli_idx")
    paths = []
    for fa in sorted(glob.glob(os.path.join(TOYDATA, "toy*.fasta.gz"))):
        name = os.path.basename(fa)[: -len(".fasta.gz")]
        dst = str(out / (name + ".dsmi"))
        p = dsm("build", fa, "-o", dst, "-v", capture_output=True)
        assert p.returncode == 0, p.stderr.decode()
        paths.append(dst)
    assert len(paths) == 5
    return paths


def golden_lines(config: str, prefix: str) -> bytes:
    with gzip.open(os.path.join(
            GOLDEN, f"server-output.{config}.{prefix}.txt.gz")) as f:
        return f.read()


def test_cli_mine_gnu_matches_golden(built_indexes):
    p = dsm("mine", "--engine", "numpy", "--reader-order", "gnu",
            "-f", "2", "-E", "1.2", "--prefix", "A", *built_indexes,
            capture_output=True)
    assert p.returncode == 0, p.stderr.decode()
    assert p.stdout == golden_lines("default", "A")


def test_cli_serve_enumerate_pipeline(built_indexes, tmp_path):
    port = 53510
    names = "".join(
        os.path.basename(x).split(".")[0] + "\n" for x in built_indexes)
    outf = open(tmp_path / "out.txt", "wb")
    server = subprocess.Popen(
        [sys.executable, "-m", "dsm_tpu", "serve", "-p", str(port),
         "-E", "1.2", "-v"],
        stdin=subprocess.PIPE, stdout=outf,
        stderr=open(tmp_path / "server.log", "wb"), env=ENV, cwd=REPO)
    server.stdin.write(names.encode())
    server.stdin.close()
    time.sleep(1.5)
    clients = []
    for idx in built_indexes:
        c = subprocess.Popen(
            [sys.executable, "-m", "dsm_tpu", "enumerate", "-f", "2", idx],
            stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL, env=ENV, cwd=REPO)
        c.stdin.write(f"localhost {port} C\n".encode())
        c.stdin.close()
        clients.append(c)
    for c in clients:
        assert c.wait(timeout=600) == 0
    assert server.wait(timeout=600) == 0
    outf.close()
    got = open(outf.name, "rb").read()
    assert got == golden_lines("default", "C")


def test_cli_enumerate_check(built_indexes):
    p = dsm("enumerate", "--check", built_indexes[0], capture_output=True)
    assert p.returncode == 0
    assert b"OK" in p.stderr


def test_cli_distance(tmp_path):
    rows = b""
    for prefix in "ACGT":
        rows += golden_lines("specific", prefix)
    p = dsm("distance", "-s", "5", "-m", "0.5,1.0", "-F", "t",
            "--outdir", str(tmp_path), input=rows, capture_output=True)
    assert p.returncode == 0, p.stderr.decode()
    for kind in ("count", "log", "sqrt", "lgamma"):
        assert (tmp_path / f"{kind}.t").exists()
    first = (tmp_path / "count.t").read_text().splitlines()[0]
    assert first.startswith("Matrix for <max_entropy>=<0.500000>")


def test_cli_validators():
    p = dsm("serve", "-p", "80", capture_output=True)
    assert p.returncode == 1
    assert b"greater than or equal to 1024" in p.stderr
    p = dsm("mine", "nonexistent.dsmi", capture_output=True)
    assert p.returncode != 0


def test_cli_mine_sharded_matches_golden(built_indexes):
    """`dsm mine --engine sharded` on the virtual 8-device CPU mesh must
    produce the reference goldens (VERDICT r2 #4: this entry point used
    to crash with a TypeError)."""
    env = {**ENV, "XLA_FLAGS": ENV.get("XLA_FLAGS", "")
           + " --xla_force_host_platform_device_count=8"}
    p = subprocess.run(
        [sys.executable, "-m", "dsm_tpu", "mine", "--engine", "sharded",
         "--reader-order", "gnu", "-f", "2", "-E", "1.2",
         "--prefix", "A", *built_indexes],
        env=env, cwd=REPO, capture_output=True)
    assert p.returncode == 0, p.stderr.decode()
    assert p.stdout == golden_lines("default", "A")


def test_cli_mine_sharded_episode(built_indexes):
    """`dsm mine --engine sharded-episode` (device-resident episode loop
    over the samples mesh) matches the numpy engine's output."""
    env = {**ENV, "XLA_FLAGS": ENV.get("XLA_FLAGS", "")
           + " --xla_force_host_platform_device_count=8"}
    want = subprocess.run(
        [sys.executable, "-m", "dsm_tpu", "mine", "--engine", "numpy",
         "-f", "2", "-E", "1.2", *built_indexes],
        env=env, cwd=REPO, capture_output=True)
    got = subprocess.run(
        [sys.executable, "-m", "dsm_tpu", "mine", "--engine",
         "sharded-episode", "-f", "2", "-E", "1.2", *built_indexes],
        env=env, cwd=REPO, capture_output=True)
    assert got.returncode == 0, got.stderr.decode()
    assert got.stdout == want.stdout
