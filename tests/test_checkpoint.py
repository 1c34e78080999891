"""Mining checkpoint/resume: kill mid-run, resume, identical output."""

import os

import numpy as np
import pytest

from dsm_tpu.mining.config import MiningConfig
from dsm_tpu.mining import checkpoint as ckpt_mod
from dsm_tpu.mining.engine_device import mine_device
from dsm_tpu.mining.engine_np import mine_np


@pytest.fixture(scope="module")
def small_indexes(rng):
    from dsm_tpu.index.alphabet import transform
    from dsm_tpu.index.fmindex import FMIndex

    genome = np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, size=600)]
    idxs = []
    for s in range(3):
        texts = [transform(genome[int(rng.integers(0, 500)):][:90].tobytes())
                 for _ in range(14)]
        idxs.append(FMIndex.from_texts(texts))
    return idxs


class _Abort(RuntimeError):
    pass


def test_checkpoint_resume_identical(small_indexes, tmp_path, monkeypatch):
    cfg = MiningConfig(fmin=1, emax=99, pmin=1)
    want = mine_np(small_indexes, cfg)
    ck = str(tmp_path / "mine.ckpt")

    # out_reserve=0 forces a drain exit (and checkpoint) after EVERY level
    # with any output; abort the run at the k-th save to simulate a crash
    orig_save = ckpt_mod.save_checkpoint
    for abort_at in (1, 3):
        if os.path.exists(ck):
            os.unlink(ck)
        calls = {"n": 0}

        def bomb(*a, **kw):
            orig_save(*a, **kw)
            calls["n"] += 1
            if calls["n"] >= abort_at:
                raise _Abort()

        monkeypatch.setattr(ckpt_mod, "save_checkpoint", bomb)
        with pytest.raises(_Abort):
            mine_device(small_indexes, cfg, out_reserve=0, checkpoint=ck,
                        tail_width=0)
        monkeypatch.setattr(ckpt_mod, "save_checkpoint", orig_save)
        assert os.path.exists(ck)

        got = mine_device(small_indexes, cfg, out_reserve=0, checkpoint=ck,
                          tail_width=0)
        assert got.format_lines() == want.format_lines(), f"abort {abort_at}"
        assert got.total_paths == want.total_paths
        assert got.total_occs == want.total_occs
        assert not os.path.exists(ck)  # removed on completion


def test_checkpoint_rejects_other_config(small_indexes, tmp_path):
    ck = str(tmp_path / "mine2.ckpt")
    from dsm_tpu.mining.engine import DeviceIndexes

    dev = DeviceIndexes.build(small_indexes)
    import numpy as np_

    ed = __import__("dsm_tpu.mining.engine_device",
                    fromlist=["_seed_episode"])
    state = ed._seed_episode(dev, 4096)
    S = dev.S
    pairs = np_.zeros((S, 8), dtype=np_.int32)
    pairs[:, ed.PC_HI] = dev.ns
    pairs[:, ed.PC_SID] = np_.arange(S)
    state = dict(state, pairs=pairs, nvalid=state["nnodes"])
    out = mine_np(small_indexes, MiningConfig(fmin=2, emax=1.2))
    cfg = MiningConfig(fmin=2, emax=1.2)
    ckpt_mod.save_checkpoint(ck, state, out, cfg, b"", dev.ns, [b""])
    with pytest.raises(ValueError, match="different"):
        ckpt_mod.load_checkpoint(ck, MiningConfig(fmin=3, emax=1.2), b"",
                                 dev.ns)
    st, out2, paths = ckpt_mod.load_checkpoint(ck, cfg, b"", dev.ns)
    assert out2.format_lines() == out.format_lines()
    assert paths == [b""]
