"""Due-diligence attempts at a Pallas per-row-DMA probe loop (the fused
hash-probe kernel candidate).  Each variant is tried independently; the
outcome (compiles or not, and its measured rate) feeds PROBE_FLOOR_r03.json.

Variants:
  v1  static-index single-row HBM->VMEM copy (sanity: does row DMA compile?)
  v2  dynamic index from SMEM input, fori_loop of depth-8 pipelined DMAs
  v3  dynamic index via scalar prefetch (the original E4 formulation)
  v4  VMEM-resident table + dynamic_gather probe (int32 reductions)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

W = 8  # 32B rows
N_ROWS = 1 << 19


def timed(fn, *args, reps=3):
    jax.device_get(fn(*args))
    jax.device_get(fn(*args))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def v1_static_row_dma():
    def kernel(hbm_ref, out_ref):
        def body(scratch, sem):
            dma = pltpu.make_async_copy(hbm_ref.at[pl.ds(7, 1), :],
                                        scratch, sem)
            dma.start()
            dma.wait()
            out_ref[0, 0] = scratch[0, 0].astype(jnp.int32)

        pl.run_scoped(body, scratch=pltpu.VMEM((1, W), jnp.uint32),
                      sem=pltpu.SemaphoreType.DMA(()))

    @jax.jit
    def run(table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(table)

    table = jnp.arange(N_ROWS * W, dtype=jnp.uint32).reshape(N_ROWS, W)
    dt = timed(run, table)
    print(f"v1 static-row DMA: OK {dt*1e3:.3f} ms", flush=True)


def v2_dyn_row_dma(n_dmas=4096, depth=8):
    def kernel(idx_ref, hbm_ref, out_ref, scratch, sems):
        def get(slot, j):
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(idx_ref[j, 0], 1), :],
                scratch.at[pl.ds(slot, 1), :],
                sems.at[slot],
            )

        for j in range(depth):
            get(j, j).start()

        def body(j, acc):
            slot = jax.lax.rem(j, depth)
            get(slot, j).wait()
            v = scratch[slot, 0].astype(jnp.int32)

            @pl.when(j + depth < n_dmas)
            def _():
                get(slot, j + depth).start()

            return acc + v

        acc = jax.lax.fori_loop(0, n_dmas, body, jnp.int32(0))
        out_ref[0, 0] = acc

    @jax.jit
    def run(idx, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.VMEM((depth, W), jnp.uint32),
                            pltpu.SemaphoreType.DMA((depth,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, table)

    table = jnp.arange(N_ROWS * W, dtype=jnp.uint32).reshape(N_ROWS, W)
    idx = ((np.arange(n_dmas, dtype=np.int64) * 2654435761) % N_ROWS).astype(
        np.int32)[:, None]
    dt = timed(run, jnp.asarray(idx), table)
    print(f"v2 dyn-row DMA depth={depth}: OK {dt*1e3:.3f} ms "
          f"{n_dmas/dt/1e6:.2f}M rows/s", flush=True)


def v3_prefetch_dma(n_dmas=4096, depth=8):
    def kernel(idx_ref, hbm_ref, out_ref, scratch, sems):
        def get(slot, j):
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(idx_ref[j], 1), :],
                scratch.at[pl.ds(slot, 1), :],
                sems.at[slot],
            )

        for j in range(depth):
            get(j, j).start()

        def body(j, acc):
            slot = jax.lax.rem(j, depth)
            get(slot, j).wait()
            v = scratch[slot, 0].astype(jnp.int32)

            @pl.when(j + depth < n_dmas)
            def _():
                get(slot, j + depth).start()

            return acc + v

        out_ref[0, 0] = jax.lax.fori_loop(0, n_dmas, body, jnp.int32(0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((depth, W), jnp.uint32),
                        pltpu.SemaphoreType.DMA((depth,))],
    )

    @jax.jit
    def run(idx, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, table)

    table = jnp.arange(N_ROWS * W, dtype=jnp.uint32).reshape(N_ROWS, W)
    idx = ((np.arange(n_dmas, dtype=np.int64) * 2654435761) % N_ROWS).astype(
        np.int32)
    dt = timed(run, jnp.asarray(idx), table)
    print(f"v3 prefetch DMA depth={depth}: OK {dt*1e3:.3f} ms "
          f"{n_dmas/dt/1e6:.2f}M rows/s", flush=True)


def v4_vmem_dyngather(T=8192, inner=32):
    def kernel(x_ref, idx_ref, out_ref):
        x = x_ref[:].astype(jnp.int32)

        def body(i, carry):
            s, idx = carry
            g = jnp.take_along_axis(x, idx & (T - 1), axis=0)
            s = s + g.sum()
            idx = idx * jnp.int32(1664525) + jnp.int32(7) + i
            return s, idx

        s, _ = jax.lax.fori_loop(0, inner, body, (jnp.int32(0), idx_ref[:]))
        out_ref[0, 0] = s

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(x, idx)

    x = jnp.arange(T * 128, dtype=jnp.uint32).reshape(T, 128)
    idx = ((np.arange(T * 128, dtype=np.int64) * 2654435761) % T).astype(
        np.int32).reshape(T, 128)
    dt = timed(run, x, jnp.asarray(idx))
    rate = T * 128 * inner / dt
    print(f"v4 VMEM dyngather [T={T},128] x{inner}: OK {dt*1e3:.3f} ms "
          f"{rate/1e6:.1f}M elems/s", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}", flush=True)
    for name, fn in (("v1", v1_static_row_dma), ("v2", v2_dyn_row_dma),
                     ("v3", v3_prefetch_dma), ("v4", v4_vmem_dyngather)):
        if which not in ("all", name):
            continue
        try:
            fn()
        except Exception as e:
            msg = str(e).replace("\n", " ")[:300]
            print(f"{name} FAILED {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
