"""Mining checkpoint/resume (SURVEY.md §5.4).

The reference has no mining checkpoints — a failed run restarts from
scratch (fail-stop everywhere, metaserver.cpp exit(1) paths).  Our
device engine's episode exits are natural checkpoints: after a drain the
output buffers are empty, so a complete snapshot is just

  * the frontier (lo/hi/elo/ehi/paths, nvalid, depth),
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

from .config import MiningConfig
from .engine_np import MinedOutput

FORMAT = 2


def _fingerprint(cfg: MiningConfig, prefix: bytes, ns) -> np.ndarray:
    blob = repr((FORMAT, cfg, prefix, list(map(int, ns)))).encode()
    return np.frombuffer(blob, dtype=np.uint8)


def save_checkpoint(path: str, state: dict, out: MinedOutput,
                    cfg: MiningConfig, prefix: bytes, ns) -> None:
    import jax

    host = {k: np.asarray(v) for k, v in jax.device_get(state).items()
            if k not in ("out_paths", "out_freq", "out_depth")}
    assert int(host["ocount"]) == 0, "checkpoint requires drained outputs"
    buf = io.BytesIO()
    pickle.dump(out, buf, protocol=4)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(
            f, __out=np.frombuffer(buf.getvalue(), dtype=np.uint8),
            __fp=_fingerprint(cfg, prefix, ns),
            **{f"st_{k}": v for k, v in host.items()})
    os.replace(tmp, path)


def load_checkpoint(path: str, cfg: MiningConfig, prefix: bytes, ns):
    """-> (host_state dict, MinedOutput).  Raises on fingerprint drift."""
    with np.load(path, allow_pickle=False) as z:
        fp = _fingerprint(cfg, prefix, ns)
        if not np.array_equal(z["__fp"], fp):
            raise ValueError(
                f"{path}: checkpoint was written for a different "
                "config/prefix/input set")
        out = pickle.loads(z["__out"].tobytes())
        state = {k[3:]: z[k] for k in z.files if k.startswith("st_")}
    return state, out
