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
    owns.  Rows partition {A,C,G,T} contiguously.  For deeper partitions
    (AA..TT and beyond, the reference's 16/64-server hash arrays in
    wrapper-SLURM/example-server.sh) use row_prefix_masks."""
    if n_prefix > 4:
        raise ValueError("use row_prefix_masks for >4 prefix rows")
    if 4 % n_prefix:
        raise ValueError("prefix axis must divide 4")
    masks = np.zeros((n_prefix, 4), dtype=bool)
    per = 4 // n_prefix
    for r in range(n_prefix):
        masks[r, r * per:(r + 1) * per] = True
    return masks


def prefix_depth(n_prefix: int) -> int:
    """Smallest k with 4**k >= n_prefix (enforced-prefix length)."""
    k = 0
    while 4 ** k < n_prefix:
        k += 1
    return k


def row_prefix_masks(n_prefix: int) -> np.ndarray:
    """(n_prefix, k, 4) bool per-depth symbol masks implementing an
    AA..TT-style contiguous partition of the 4**k length-k DNA prefixes
    into n_prefix rows (k = prefix_depth(n_prefix)).

    Row r owns prefixes with base-4 index in [r*stride, (r+1)*stride),
    stride = 4**k // n_prefix.  Because n_prefix is a power of two the
    owned range is "aligned": at every depth the allowed symbols are
    path-independent, so the ownership is exactly a per-depth mask —
    which is what the mining engines consume (mirrors the reference's
    one-enforcepath-per-server topology, metaenumerate.cpp:268-309)."""
    if n_prefix & (n_prefix - 1):
        raise ValueError("prefix rows must be a power of two")
    k = prefix_depth(n_prefix)
    if k == 0:
        return np.ones((1, 0, 4), dtype=bool)
    stride, rem = divmod(4 ** k, n_prefix)
    if rem:
        raise ValueError("prefix rows must divide 4**k")
    masks = np.zeros((n_prefix, k, 4), dtype=bool)
    for r in range(n_prefix):
        lo, hi = r * stride, (r + 1) * stride
        for d in range(k):
            unit = 4 ** (k - 1 - d)
            syms = {(i // unit) % 4 for i in range(lo, hi)}
            masks[r, d, sorted(syms)] = True
    return masks


def prefixes_of_row(n_prefix: int, row: int) -> list[bytes]:
    """The length-k DNA prefixes row `row` owns (contiguous partition,
    matching row_prefix_masks)."""
    k = prefix_depth(n_prefix)
    stride = 4 ** k // n_prefix
    bases = b"ACGT"
    out = []
    for i in range(row * stride, (row + 1) * stride):
        digs = [(i // 4 ** (k - 1 - d)) % 4 for d in range(k)]
        out.append(bytes(bases[x] for x in digs))
    return out
