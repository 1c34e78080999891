"""Wire-protocol interop vs the LIVE reference binaries.

Matrix covered (all on fresh toydata built in-session):
  * codec: native C++ parser/encoder == pure-Python wire.py, random
    trees, arbitrary chunking;
  * client byte-parity: our serialize_trie == the exact bytes the real
    `metaenumerate` sends for the same index/config (captured with a
    raw socket sink);
  * our client -> reference metaserver == reference client -> reference
    metaserver (stdout diff);
  * reference metaenumerate -> our serve() == reference metaserver
    (stdout diff, byte-exact incl. reader order);
  * our client -> our server == reference pipeline.

Requires the compiled reference at $DSM_REF_BIN (default /tmp/refsrc);
tests skip when binaries or a toolchain are missing.
"""

from __future__ import annotations

import os
import socket
import subprocess
import threading
import time

import numpy as np
import pytest

from dsm_tpu.index.alphabet import transform
from dsm_tpu.index.fasta import read_fasta
from dsm_tpu.index.fmindex import FMIndex
from dsm_tpu.mining.config import MiningConfig
from dsm_tpu.net import client as netclient
from dsm_tpu.net import server as netserver
from dsm_tpu.net.native import NativeTrieParser, get_lib, native_encode
from dsm_tpu.net.wire import CLOSE, OPEN, TrieParser, encode_events

REF_BIN = os.environ.get("DSM_REF_BIN", "/tmp/refsrc")
PREFIXES = ["A", "C", "G", "T"]

have_ref = all(
    os.path.exists(os.path.join(REF_BIN, b))
    for b in ("builder", "metaenumerate", "metaserver"))
needs_ref = pytest.mark.skipif(not have_ref, reason="reference not built")


# ---------------------------------------------------------------- codec --

def random_events(rng, n_nodes=200, max_freq=1 << 40):
    types, syms, freqs = [], [], []
    depth = 0
    opened = 0
    closes_left = []
    while opened < n_nodes or depth > 0:
        can_open = opened < n_nodes
        if can_open and (depth == 0 or rng.random() < 0.55):
            types.append(OPEN)
            syms.append(rng.choice(list(b"ACGTN")))
            freqs.append(0)
            opened += 1
            depth += 1
        else:
            types.append(CLOSE)
            syms.append(rng.choice(list(b"0NACGT")))
            freqs.append(int(rng.integers(0, max_freq)))
            depth -= 1
        closes_left = closes_left
    return (np.array(types, np.uint8), np.array(syms, np.uint8),
            np.array(freqs, np.uint64))


def test_codec_roundtrip_and_native_equivalence(rng):
    if get_lib() is None:
        pytest.skip("no toolchain for native codec")
    for trial in range(5):
        types, syms, freqs = random_events(rng)
        py_bytes, n, depth = encode_events(types, syms, freqs)
        nat = native_encode(types, syms, freqs)
        assert nat[0] == py_bytes and nat[1] == n and nat[2] == depth

        for parser in (TrieParser(), NativeTrieParser()):
            events = []
            pos = 0
            while pos < len(py_bytes):
                step = int(rng.integers(1, 37))
                events.extend(parser.feed(py_bytes[pos:pos + step]))
                pos += step
            assert parser.pending == 0
            assert len(events) == len(types)
            for i, ev in enumerate(events):
                if types[i] == OPEN:
                    assert ev == (OPEN, syms[i])
                else:
                    assert ev == (CLOSE, int(freqs[i]), syms[i])


def test_codec_detects_bad_checksum():
    # hand-build a node whose checksum is wrong
    buf = bytearray(b"(A")
    buf += bytes([0x81])          # freq 1
    buf += b"R" + bytes([0x85])   # checksum 5, but n == 1
    buf += b"0)"
    for parser in [TrieParser()] + (
            [NativeTrieParser()] if get_lib() else []):
        with pytest.raises(Exception, match="checksum"):
            parser.feed(bytes(buf))


# ------------------------------------------------------------- fixtures --

@pytest.fixture(scope="module")
def interop_data(tmp_path_factory):
    """Fresh-seed toydata + reference .fmi indexes + our FMIndexes."""
    if not have_ref:
        pytest.skip("reference not built")
    from tests.make_toydata import make_toydata

    out = tmp_path_factory.mktemp("interop_data")
    seed_orig = np.random.default_rng
    np.random.default_rng = lambda *a, **k: seed_orig(0xC0FFEE)
    try:
        make_toydata(str(out))
    finally:
        np.random.default_rng = seed_orig
    samples = sorted(f[:-6] for f in os.listdir(out) if f.endswith(".fasta"))
    idxs = {}
    for s in samples:
        subprocess.run([os.path.join(REF_BIN, "builder"), s + ".fasta"],
                       cwd=out, check=True, capture_output=True)
        texts, names = [], []
        for rec in read_fasta(os.path.join(out, s + ".fasta")):
            texts.append(transform(rec.seq))
            names.append(rec.name)
        idxs[s] = FMIndex.from_texts(texts, names)
    return str(out), samples, idxs


class CaptureSink(threading.Thread):
    """One-connection byte sink standing in for a metaserver."""

    def __init__(self):
        super().__init__(daemon=True)
        self.srv = socket.socket()
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(4)
        self.port = self.srv.getsockname()[1]
        self.data = b""

    def run(self):
        conn, _ = self.srv.accept()
        chunks = []
        while True:
            d = conn.recv(65536)
            if not d:
                break
            chunks.append(d)
        self.data = b"".join(chunks)
        conn.close()
        self.srv.close()


# -------------------------------------------------- client byte parity --

@needs_ref
@pytest.mark.parametrize("fmin,maxdepth,prefix", [
    (2, None, "A"), (5, None, "C"), (1, 14, "G"), (2, 12, "T"),
    (1, 10, "AC")])
def test_client_bytes_match_reference(interop_data, fmin, maxdepth, prefix):
    datadir, samples, idxs = interop_data
    s = samples[0]
    sink = CaptureSink()
    sink.start()
    args = [os.path.join(REF_BIN, "metaenumerate"), "--fmin", str(fmin)]
    if maxdepth:
        args += ["--maxdepth", str(maxdepth)]
    args.append(s + ".fasta.fmi")
    p = subprocess.run(
        args, input=f"localhost {sink.port} {prefix}\n".encode(),
        cwd=datadir, capture_output=True, timeout=600)
    assert p.returncode == 0, p.stderr.decode()
    sink.join(timeout=60)

    payload, _ = netclient.serialize_trie(
        idxs[s], fmin,
        maxdepth if maxdepth else netclient.UNLIMITED_DEPTH,
        prefix.encode())
    want = b"S" + s.encode() + b"." + payload
    assert sink.data == want, (
        f"first diff at {next((i for i, (a, b) in enumerate(zip(sink.data, want)) if a != b), min(len(sink.data), len(want)))}"
        f" lens {len(sink.data)} vs {len(want)}")


# ------------------------------------------------ pipeline permutations --

SERVER_CFG = MiningConfig(fmin=2, emax=1.2)


def run_ref_pipeline(datadir, samples, config_args, client_args, outdir,
                     base_port):
    os.makedirs(outdir, exist_ok=True)
    names = ("\n".join(samples) + "\n").encode()
    servers = []
    for i, prefix in enumerate(PREFIXES):
        out = open(os.path.join(outdir, f"ref.{prefix}.txt"), "wb")
        p = subprocess.Popen(
            [os.path.join(REF_BIN, "metaserver"), "-p", str(base_port + i),
             *config_args],
            stdin=subprocess.PIPE, stdout=out,
            stderr=subprocess.DEVNULL, cwd=datadir)
        p.stdin.write(names)
        p.stdin.close()
        servers.append((p, out))
    time.sleep(0.8)
    hostinfo = "".join(f"localhost {base_port + i} {prefix}\n"
                       for i, prefix in enumerate(PREFIXES)).encode()
    clients = [subprocess.Popen(
        [os.path.join(REF_BIN, "metaenumerate"), *client_args,
         s + ".fasta.fmi"],
        stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL, cwd=datadir) for s in samples]
    for p, s in zip(clients, samples):
        p.stdin.write(hostinfo)
        p.stdin.close()
    for p in clients:
        assert p.wait(timeout=600) == 0
    result = {}
    for (p, out), prefix in zip(servers, PREFIXES):
        assert p.wait(timeout=600) == 0
        out.close()
        result[prefix] = open(out.name, "rb").read()
    return result


@needs_ref
def test_our_client_vs_reference_server(interop_data, tmp_path):
    datadir, samples, idxs = interop_data
    golden = run_ref_pipeline(datadir, samples, ["--emax", "1.2"],
                              ["--fmin", "2"], str(tmp_path), 53310)

    # same topology, our client processes instead of metaenumerate
    names = ("\n".join(samples) + "\n").encode()
    servers = []
    for i, prefix in enumerate(PREFIXES):
        out = open(tmp_path / f"ours.{prefix}.txt", "wb")
        p = subprocess.Popen(
            [os.path.join(REF_BIN, "metaserver"), "-p", str(53330 + i),
             "--emax", "1.2"],
            stdin=subprocess.PIPE, stdout=out,
            stderr=subprocess.DEVNULL, cwd=datadir)
        p.stdin.write(names)
        p.stdin.close()
        servers.append((p, out, prefix))
    time.sleep(0.8)
    hostinfos = [("localhost", 53330 + i, prefix)
                 for i, prefix in enumerate(PREFIXES)]
    threads = [threading.Thread(
        target=netclient.run_client,
        args=(idxs[s], s, hostinfos), kwargs=dict(fmin=2), daemon=True)
        for s in samples]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    for p, out, prefix in servers:
        assert p.wait(timeout=600) == 0
        out.close()
        got = open(out.name, "rb").read()
        assert got == golden[prefix], f"prefix {prefix} differs"


@needs_ref
def test_reference_client_vs_our_server(interop_data, tmp_path):
    datadir, samples, idxs = interop_data
    golden = run_ref_pipeline(datadir, samples, ["--emax", "1.2"],
                              ["--fmin", "2"], str(tmp_path), 53350)

    outputs = {}
    threads = []
    for i, prefix in enumerate(PREFIXES):
        out = open(tmp_path / f"ours.{prefix}.txt", "wb")
        outputs[prefix] = out

        def work(port=53370 + i, o=out):
            netserver.serve(port, list(samples), SERVER_CFG, out=o,
                            err=open(os.devnull, "w"))
        t = threading.Thread(target=work, daemon=True)
        t.start()
        threads.append(t)
    time.sleep(0.8)
    hostinfo = "".join(f"localhost {53370 + i} {prefix}\n"
                       for i, prefix in enumerate(PREFIXES)).encode()
    clients = [subprocess.Popen(
        [os.path.join(REF_BIN, "metaenumerate"), "--fmin", "2",
         s + ".fasta.fmi"],
        stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL, cwd=datadir) for s in samples]
    for p in clients:
        p.stdin.write(hostinfo)
        p.stdin.close()
    for p in clients:
        assert p.wait(timeout=600) == 0
    for t in threads:
        t.join(timeout=600)
        assert not t.is_alive()
    for prefix in PREFIXES:
        outputs[prefix].close()
        got = open(outputs[prefix].name, "rb").read()
        assert got == golden[prefix], f"prefix {prefix} differs"


@needs_ref
def test_full_interop_ours_to_ours(interop_data, tmp_path):
    datadir, samples, idxs = interop_data
    golden = run_ref_pipeline(datadir, samples, ["--emax", "1.2"],
                              ["--fmin", "2"], str(tmp_path), 53390)

    outputs = {}
    sthreads = []
    for i, prefix in enumerate(PREFIXES):
        out = open(tmp_path / f"oo.{prefix}.txt", "wb")
        outputs[prefix] = out

        def work(port=53410 + i, o=out):
            netserver.serve(port, list(samples), SERVER_CFG, out=o,
                            err=open(os.devnull, "w"))
        t = threading.Thread(target=work, daemon=True)
        t.start()
        sthreads.append(t)
    time.sleep(0.5)
    hostinfos = [("localhost", 53410 + i, prefix)
                 for i, prefix in enumerate(PREFIXES)]
    cthreads = [threading.Thread(
        target=netclient.run_client,
        args=(idxs[s], s, hostinfos), kwargs=dict(fmin=2), daemon=True)
        for s in samples]
    for t in cthreads:
        t.start()
    for t in cthreads:
        t.join(timeout=600)
    for t in sthreads:
        t.join(timeout=600)
        assert not t.is_alive()
    for prefix in PREFIXES:
        outputs[prefix].close()
        got = open(outputs[prefix].name, "rb").read()
        assert got == golden[prefix], f"prefix {prefix} differs"
