"""Trustworthy micro-timing on the tunneled TPU.

Two failure modes make naive `for _ in range(reps): f(x)` loops lie on
this toolchain (observed on the axon-tunneled v5e, round 5):

  * `block_until_ready` can return before the device finishes, so a
    single timed call measures dispatch (~0.06 ms), not execution;
  * repeated executions of the SAME executable on the SAME input
    buffers are sometimes elided (identical 6M-lane sorts measured
    0.04 ms after the first few calls).

`timeit` defeats both: every rep feeds a value derived from the
previous rep's OUTPUT back into the input (data dependence → nothing
can be elided or overlapped away), and the loop ends with a host
transfer of a scalar reduced from the final output (a real sync).

The function under test must take (x, *args) with x an int32 scalar-ish
perturbation array and return something array-like; timeit feeds
x' = g(out) each rep.  For pure-shape benches wrap your op as
`lambda x, a: op(a + x)` or similar — the +x must reach the hot input.
"""

from __future__ import annotations

import time

import numpy as np


def timeit(name: str, f, x0, *args, reps: int = 20, file=None) -> float:
    """Time `f(x, *args)` with chained perturbation; prints and returns
    seconds per rep."""
    import jax
    import jax.numpy as jnp

    import sys
    file = file or sys.stderr

    fj = jax.jit(f)

    def chain(x, out):
        # derive the next perturbation from the output: forces each rep
        # to depend on the previous one
        leaf = jax.tree.leaves(out)[0]
        v = leaf.reshape(-1)[:1].astype(jnp.int32) & 1
        return (x + v).astype(jnp.int32)

    cj = jax.jit(chain)
    x = jnp.zeros(1, jnp.int32) + jnp.asarray(x0, jnp.int32)
    out = fj(x, *args)
    x = cj(x, out)
    out = fj(x, *args)          # warm both branches of the chain
    np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])  # real sync
    t0 = time.perf_counter()
    for _ in range(reps):
        x = cj(x, out)
        out = fj(x, *args)
    np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
    dt = (time.perf_counter() - t0) / reps
    print(f"  {name:56s} {dt*1e3:8.2f} ms", file=file, flush=True)
    return dt
