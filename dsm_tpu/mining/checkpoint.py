"""Mining checkpoint/resume (SURVEY.md §5.4).

The reference has no mining checkpoints — a failed run restarts from
scratch (fail-stop everywhere, metaserver.cpp exit(1) paths).  Our
device engine's episode exits are natural checkpoints: after a drain the
output buffers are empty and the live frontier's paths can be decoded
from the device-resident history, so a complete snapshot is just

  * the frontier (lo/hi/rlo, nvalid, depth),
  * the decoded paths of the live frontier rows (the history itself is
    not persisted — paths re-seed a PathHistory base on resume),
  * the run counters (total_paths, entropy range),
  * the outputs accumulated on the host so far,
  * a fingerprint of (config, prefix, sample sizes) to refuse resuming
    against different inputs.

Files are written atomically (tmp + rename) as .npz with a pickled
MinedOutput payload.  The host tail stage (engine_np.mine_from_level)
runs after the last device episode and is not checkpointed mid-flight;
a resume re-enters it from the handed-off frontier.
"""

from __future__ import annotations

import io
import os
import pickle

import numpy as np

from ..index.alphabet import EXT_CHARS
from .config import MiningConfig
from .engine_np import MinedOutput

FORMAT = 3
_STATE_KEYS = ("lo", "hi", "rlo", "nvalid", "depth", "total_paths",
               "ent_min", "ent_max")


def _fingerprint(cfg: MiningConfig, prefix: bytes, ns) -> np.ndarray:
    blob = repr((FORMAT, cfg, prefix, list(map(int, ns)))).encode()
    return np.frombuffer(blob, dtype=np.uint8)


def _pack_paths(paths: list[bytes], depth: int) -> np.ndarray:
    """(rows, depth) uint8 matrix of extension-code digits."""
    lut = np.zeros(256, dtype=np.uint8)
    for i, b in enumerate(EXT_CHARS):
        lut[b] = i
    mat = np.zeros((len(paths), depth), dtype=np.uint8)
    for i, p in enumerate(paths):
        mat[i] = lut[np.frombuffer(p, dtype=np.uint8)]
    return mat


def _unpack_paths(mat: np.ndarray) -> list[bytes]:
    ext = np.frombuffer(EXT_CHARS, dtype=np.uint8)
    return [ext[row.astype(np.int64)].tobytes() for row in mat]


def save_checkpoint(path: str, state: dict, out: MinedOutput,
                    cfg: MiningConfig, prefix: bytes, ns,
                    live_paths: list[bytes]) -> None:
    import jax

    nvalid = int(state["nvalid"])
    host = {k: np.asarray(v) for k, v in jax.device_get(
        {k: state[k] for k in _STATE_KEYS}).items()}
    assert int(state["ocount"]) == 0, "checkpoint requires drained outputs"
    for k in ("lo", "hi", "rlo"):
        host[k] = host[k][:nvalid]
    buf = io.BytesIO()
    pickle.dump(out, buf, protocol=4)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(
            f, __out=np.frombuffer(buf.getvalue(), dtype=np.uint8),
            __fp=_fingerprint(cfg, prefix, ns),
            __paths=_pack_paths(live_paths, int(host["depth"])),
            **{f"st_{k}": v for k, v in host.items()})
    os.replace(tmp, path)


def load_checkpoint(path: str, cfg: MiningConfig, prefix: bytes, ns):
    """-> (host_state dict, MinedOutput, live frontier paths).
    Raises on fingerprint drift."""
    with np.load(path, allow_pickle=False) as z:
        fp = _fingerprint(cfg, prefix, ns)
        if not np.array_equal(z["__fp"], fp):
            raise ValueError(
                f"{path}: checkpoint was written for a different "
                "config/prefix/input set")
        out = pickle.loads(z["__out"].tobytes())
        state = {k[3:]: z[k] for k in z.files if k.startswith("st_")}
        paths = _unpack_paths(z["__paths"])
    return state, out, paths
