"""Device-mesh construction for the mining wavefront.

The reference scales along two axes (SURVEY.md §2.5):
  * samples — one metaenumerate process per sample, merged by a server
    over d TCP streams (metaserver.cpp:682-728);
  * trie prefixes — one metaserver per DNA-prefix shard, clients descend
    each server's enforcepath (wrapper-SLURM/example-server.sh,
    EnumerateQuery.cpp:240-290).

Here both become mesh axes: ('prefix', 'samples').  The samples axis
shards the per-sample occ tables and frequency columns — the TCP merge
becomes psums over ICI.  The prefix axis shards disjoint depth-0 symbol
partitions of the union trie — embarrassingly parallel, no collectives,
exactly like the reference's per-prefix server processes.
"""

from __future__ import annotations

import numpy as np

PREFIX_AXIS = "prefix"
SAMPLES_AXIS = "samples"


def make_mesh(n_prefix: int, n_samples: int, devices=None):
    import jax

    if devices is None:
        devices = jax.devices()
    need = n_prefix * n_samples
    if len(devices) < need:
        raise ValueError(
            f"mesh {n_prefix}x{n_samples} needs {need} devices, "
            f"have {len(devices)}")
    arr = np.array(devices[:need]).reshape(n_prefix, n_samples)
    return jax.sharding.Mesh(arr, (PREFIX_AXIS, SAMPLES_AXIS))


def default_mesh_shape(n_devices: int) -> tuple[int, int]:
    """Factor a device count into (prefix, samples) axes: prefer 4 prefix
    shards (the reference's production A/C/G/T partitioning), else 2."""
    for p in (4, 2, 1):
        if n_devices % p == 0:
            return p, n_devices // p
    return 1, n_devices


def row_masks(n_prefix: int) -> np.ndarray:
    """(n_prefix, 4) bool: which depth-0 child symbols each prefix row
    owns.  Rows partition {A,C,G,T} contiguously."""
    if 4 % n_prefix and n_prefix % 4:
        raise ValueError("prefix axis must divide or be divisible by 4")
    masks = np.zeros((n_prefix, 4), dtype=bool)
    if n_prefix <= 4:
        per = 4 // n_prefix
        for r in range(n_prefix):
            masks[r, r * per:(r + 1) * per] = True
    else:
        raise NotImplementedError(
            "deeper prefix partitions (AA..TT) arrive with multi-host mode")
    return masks
