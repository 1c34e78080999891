"""Minimized repros for the two Mosaic toolchain bugs that block the
Pallas compaction kernel (ops/pallas_compact.py; VERDICT r4 task 6).

Run:  python tools/pallas_repro.py
Each case compiles+runs a tiny kernel and prints PASS / the failure.

1. `smem_carry`    — grid + SMEM running offset, no DMA: baseline that
                     COMPILES on this toolchain (sanity).
2. `async_copy`    — the same kernel plus ONE make_async_copy from a
                     VMEM scratch to the output ref: the remote compile
                     helper returns HTTP 500 (tpu_compile_helper
                     subprocess crash).
3. `dynamic_store` — a dynamic-offset VMEM store (pl.store with a
                     pl.ds whose start is data-dependent): compiles but
                     produces wrong values (masked-swap lowering bug) —
                     the repro checks the output and prints MISCOMPILE
                     when the toolchain is affected.

If all three print PASS on a future toolchain, ops/pallas_compact.py
can be promoted to the production compaction path.

Observed on the round-5 toolchain (jax 0.9.0, axon remote compile):
  * async_copy: HTTP 500 (tpu_compile_helper subprocess crash), every
    run — DMA-bearing kernels cannot be compiled remotely;
  * smem_carry: intermittent HTTP 500 on the SAME kernel across runs —
    even DMA-free kernels compile only sometimes;
  * dynamic_store: passed in this minimal form (the masked-swap
    miscompile that hit ops/pallas_compact.py needs the fuller kernel).
Conclusion recorded in BENCHLOG_r05.md: multi-operand sorted
compaction IS the practical floor on this toolchain; the Pallas
kernel remains parked with these repros.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np  # noqa: E402


def main() -> None:
    from dsm_tpu.utils.jaxsetup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    import jax.experimental.pallas.tpu as pltpu

    N, BLK = 1024, 256
    x = jnp.arange(N, dtype=jnp.int32)

    def report(name, fn, want):
        try:
            got = np.asarray(fn())
            if want is not None and not np.array_equal(got, want):
                print(f"{name}: MISCOMPILE (got head {got[:8]}, "
                      f"want head {want[:8]})")
            else:
                print(f"{name}: PASS")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: COMPILE/RUN FAILURE: {str(e)[:160]}")

    # 1. grid + SMEM carry, static stores only
    def k1(x_ref, o_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[0] = 0

        o_ref[...] = x_ref[...] + acc_ref[0]
        acc_ref[0] = acc_ref[0] + 1

    def run1():
        return pl.pallas_call(
            k1,
            grid=(N // BLK,),
            in_specs=[pl.BlockSpec((BLK,), lambda i: (i,))],
            out_specs=pl.BlockSpec((BLK,), lambda i: (i,)),
            out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        )(x)

    want1 = np.asarray(x) + np.repeat(np.arange(N // BLK), BLK)
    report("smem_carry", run1, want1)

    # 2. + one async copy VMEM->output
    def k2(x_ref, o_ref, scratch, sem):
        scratch[...] = x_ref[...] * 2
        cp = pltpu.make_async_copy(scratch, o_ref, sem)
        cp.start()
        cp.wait()

    def run2():
        return pl.pallas_call(
            k2,
            grid=(N // BLK,),
            in_specs=[pl.BlockSpec((BLK,), lambda i: (i,))],
            out_specs=pl.BlockSpec((BLK,), lambda i: (i,)),
            out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
            scratch_shapes=[pltpu.VMEM((BLK,), jnp.int32),
                            pltpu.SemaphoreType.DMA],
        )(x)

    report("async_copy", run2, np.asarray(x) * 2)

    # 3. dynamic-offset VMEM store
    def k3(x_ref, o_ref):
        v = x_ref[...]
        # data-dependent offset (here: constant 0 computed from data so
        # the compiler cannot fold it); the store writes BLK rows at it
        off = jnp.sum(v[:1]) * 0
        o_ref[pl.ds(off, BLK)] = v[:BLK]
        o_ref[pl.ds(off + BLK, N - BLK)] = v[BLK:]

    def run3():
        return pl.pallas_call(
            k3,
            in_specs=[pl.BlockSpec((N,), lambda: (0,))],
            out_specs=pl.BlockSpec((N,), lambda: (0,)),
            out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
        )(x[:N])

    report("dynamic_store", run3, np.asarray(x))


if __name__ == "__main__":
    main()
