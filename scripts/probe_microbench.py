"""Device microbenchmarks for hash-probe kernel design decisions.

Measures, on the real chip, the primitives a faster probe could be built
from.  Each experiment amortizes ITERS iterations inside one jit (index
streams are regenerated on device between iterations so XLA cannot CSE the
gathers), and the timed quantity is a full dispatch + device_get of a small
checksum -- blocking microbenchmarks over the tunnel lie (CLAUDE.md).

  E1  XLA row-gather throughput vs row width and table size
  E2  XLA sort throughput (flat u32, key+payload, batched rows)
  E3  Pallas tpu.dynamic_gather (sublane gather in VMEM) throughput
  E4  Pallas per-row HBM->VMEM DMA issue/latency rate
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1 << 19  # gathered rows per iteration (bench batch: 2048 q x 256 kmers)
ITERS = 16


def timed(fn, *args):
    """Best-of-3 full-cycle timing of a jitted fn returning a tiny array."""
    jax.device_get(fn(*args))  # compile + cold dispatch
    jax.device_get(fn(*args))  # warm executable
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


LCG_A = np.uint32(1664525)
LCG_C = np.uint32(1013904223)


def gather_bench(n_buckets: int, width: int):
    mask = jnp.uint32(n_buckets - 1)

    @jax.jit
    def run(table, idx0):
        def body(i, carry):
            s, idx = carry
            rows = jnp.take(table, (idx & mask).astype(jnp.int32), axis=0)
            s = s + rows[:, 0].astype(jnp.uint32).sum()
            idx = idx * LCG_A + (LCG_C + i.astype(jnp.uint32))
            return s, idx
        s, _ = jax.lax.fori_loop(
            0, ITERS, body, (jnp.uint32(0), idx0))
        return s

    table = jnp.arange(n_buckets * width, dtype=jnp.uint32).reshape(
        n_buckets, width)
    idx0 = jnp.arange(N, dtype=jnp.uint32) * jnp.uint32(2654435761)
    dt = timed(run, table, idx0)
    rate = N * ITERS / dt
    print(f"E1 gather  buckets=2^{n_buckets.bit_length()-1} width={width:3d}u32"
          f" ({width*4:4d}B rows): {dt*1e3:8.2f} ms/call "
          f"{rate/1e6:7.1f}M rows/s", flush=True)


def windowed_gather_bench(n_buckets: int, width: int, window: int):
    """E5: one lax.gather of a `window`-row slice per probe (candidate
    layout: 2-choice cuckoo confined to ADJACENT rows, so both candidate
    buckets arrive in ONE gather).  Cost question: does the gather engine
    charge per slice or per row?"""
    mask = jnp.uint32(n_buckets - 1 - (window - 1))
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))

    @jax.jit
    def run(table, idx0):
        def body(i, carry):
            s, idx = carry
            starts = (idx & mask).astype(jnp.int32)[:, None]
            rows = jax.lax.gather(
                table, starts, dnums, slice_sizes=(window, width),
                mode=jax.lax.GatherScatterMode.CLIP)
            s = s + rows[:, 0, 0].astype(jnp.uint32).sum()
            idx = idx * LCG_A + (LCG_C + i.astype(jnp.uint32))
            return s, idx
        s, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.uint32(0), idx0))
        return s

    table = jnp.arange(n_buckets * width, dtype=jnp.uint32).reshape(
        n_buckets, width)
    idx0 = jnp.arange(N, dtype=jnp.uint32) * jnp.uint32(2654435761)
    try:
        dt = timed(run, table, idx0)
    except Exception as e:
        print(f"E5 wgather win={window} width={width}: FAILED "
              f"{type(e).__name__}: {str(e)[:160]}", flush=True)
        return
    rate = N * ITERS / dt
    print(f"E5 wgather buckets=2^{n_buckets.bit_length()-1} width={width:3d}"
          f" window={window} ({window*width*4:4d}B slices): {dt*1e3:8.2f} "
          f"ms/call {rate/1e6:7.1f}M slices/s", flush=True)


def sorted_gather_bench(n_buckets: int, width: int, kind: str):
    """E6: gather-row cost vs index locality.  'sorted' = ascending indices
    (maximal page locality), 'runs' = postings-expansion-like runs of 16
    consecutive rows, 'random' = LCG (the E1 baseline)."""
    @jax.jit
    def run(table, idx):
        def body(i, carry):
            s, shift = carry
            rows = jnp.take(table, (idx + shift) & jnp.int32(n_buckets - 1),
                            axis=0)
            s = s + rows[:, 0].astype(jnp.uint32).sum()
            return s, shift + jnp.int32(12345)
        s, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.uint32(0), jnp.int32(0)))
        return s

    table = jnp.arange(n_buckets * width, dtype=jnp.uint32).reshape(
        n_buckets, width)
    if kind == "sorted":
        idx = np.sort((np.arange(N, dtype=np.int64) * 2654435761
                       % n_buckets).astype(np.int32))
    elif kind == "runs":
        base = (np.arange(N // 16, dtype=np.int64) * 2654435761
                % n_buckets).astype(np.int32)
        idx = (base[:, None] + np.arange(16, dtype=np.int32)[None, :]
               ).reshape(-1) % n_buckets
    else:
        idx = (np.arange(N, dtype=np.int64) * 2654435761 % n_buckets).astype(
            np.int32)
    dt = timed(run, table, jnp.asarray(idx))
    rate = N * ITERS / dt
    print(f"E6 gather  {kind:6s} width={width:3d}: {dt*1e3:8.2f} ms/call "
          f"{rate/1e6:7.1f}M rows/s", flush=True)


def sort_bench(kind: str):
    @jax.jit
    def run_flat(x0):
        def body(i, carry):
            s, x = carry
            y = jnp.sort(x)
            s = s + y[0] + y[-1]
            x = x * LCG_A + (LCG_C + i.astype(jnp.uint32))
            return s, x
        s, _ = jax.lax.fori_loop(0, 4, body, (jnp.uint32(0), x0))
        return s

    @jax.jit
    def run_pair(x0):
        def body(i, carry):
            s, x = carry
            payload = x ^ jnp.uint32(0xDEADBEEF)
            yk, yv = jax.lax.sort((x, payload), num_keys=1)
            s = s + yk[0] + yv[-1]
            x = x * LCG_A + (LCG_C + i.astype(jnp.uint32))
            return s, x
        s, _ = jax.lax.fori_loop(0, 4, body, (jnp.uint32(0), x0))
        return s

    @jax.jit
    def run_rows(x0):
        def body(i, carry):
            s, x = carry
            y = jnp.sort(x, axis=1)
            s = s + y[0, 0] + y[-1, -1]
            x = x * LCG_A + (LCG_C + i.astype(jnp.uint32))
            return s, x
        s, _ = jax.lax.fori_loop(0, 4, body, (jnp.uint32(0), x0))
        return s

    x0 = jnp.arange(N, dtype=jnp.uint32) * jnp.uint32(2654435761)
    if kind == "flat":
        dt = timed(run_flat, x0)
    elif kind == "pair":
        dt = timed(run_pair, x0)
    else:
        dt = timed(run_rows, x0.reshape(2048, 256))
    per_sort = dt / 4
    print(f"E2 sort    {kind:5s} n={N}: {per_sort*1e3:8.2f} ms/sort", flush=True)


def pallas_dyngather_bench(T: int, inner_iters: int = 32):
    """tpu.dynamic_gather via jnp.take_along_axis(x, idx, axis=0) on
    [T, 128] operands resident in VMEM: out[i, j] = x[idx[i, j], j]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, idx_ref, out_ref):
        x = x_ref[:]

        def body(i, carry):
            s, idx = carry
            g = jnp.take_along_axis(x, idx & (T - 1), axis=0)
            s = s + g.astype(jnp.uint32).sum()
            idx = idx * jnp.int32(1664525) + jnp.int32(7) + i
            return s, idx

        s, _ = jax.lax.fori_loop(
            0, inner_iters, body,
            (jnp.uint32(0), idx_ref[:]))
        out_ref[0, 0] = s

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(x, idx)

    x = jnp.arange(T * 128, dtype=jnp.uint32).reshape(T, 128)
    idx = (np.arange(T * 128, dtype=np.int64) * 2654435761 % T).astype(np.int32)
    idx = jnp.asarray(idx.reshape(T, 128))
    try:
        dt = timed(run, x, idx)
    except Exception as e:
        print(f"E3 dyngather T={T}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return
    rate = T * 128 * inner_iters / dt
    print(f"E3 dyngather [T={T:6d},128] x{inner_iters}: {dt*1e3:8.2f} ms/call "
          f"{rate/1e6:7.1f}M elems/s", flush=True)


def pallas_dma_bench(n_dmas: int = 4096, depth: int = 8):
    """Per-row HBM->VMEM DMA rate with `depth` outstanding copies."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = 16  # 64B rows

    def kernel(idx_ref, hbm_ref, out_ref, scratch, sems):
        def get(slot, j):
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(idx_ref[j], 1), :],
                scratch.at[pl.ds(slot, 1), :],
                sems.at[slot],
            )

        for j in range(depth):
            get(j, j).start()

        def body(j, _):
            slot = jax.lax.rem(j, depth)
            get(slot, j).wait()

            @pl.when(j + depth < n_dmas)
            def _():
                get(slot, j + depth).start()
            return 0

        jax.lax.fori_loop(0, n_dmas, body, 0)
        out_ref[0, 0] = scratch[0, 0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((depth, W), jnp.uint32),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )

    @jax.jit
    def run(idx, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.uint32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, table)

    n_buckets = 1 << 19
    table = jnp.arange(n_buckets * W, dtype=jnp.uint32).reshape(n_buckets, W)
    idx = (np.arange(n_dmas, dtype=np.int64) * 2654435761 % n_buckets).astype(
        np.int32)
    try:
        dt = timed(run, jnp.asarray(idx), table)
    except Exception as e:
        print(f"E4 dma depth={depth}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return
    rate = n_dmas / dt
    print(f"E4 dma     depth={depth}: {dt*1e3:8.2f} ms/{n_dmas} DMAs "
          f"{rate/1e6:7.2f}M rows/s", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}", flush=True)
    if which in ("all", "e1"):
        for width in (2, 8, 16, 24, 32):
            gather_bench(1 << 19, width)
        for nb in (1 << 14, 1 << 16, 1 << 22):
            gather_bench(nb, 16)
    if which == "e1b":
        for width in (1, 4):
            gather_bench(1 << 19, width)
        gather_bench(1 << 22, 4)
        gather_bench(1 << 22, 2)
        gather_bench(1 << 24, 2)
    if which in ("all", "e5"):
        windowed_gather_bench(1 << 19, 6, 2)   # adjacent-window cuckoo probe
        windowed_gather_bench(1 << 19, 6, 1)   # slice-form control
        windowed_gather_bench(1 << 19, 12, 1)  # duplicated-row 48B control
        windowed_gather_bench(1 << 22, 6, 2)   # big-table variant
    if which in ("all", "e6"):
        for kind in ("random", "runs", "sorted"):
            sorted_gather_bench(1 << 19, 6, kind)
        for kind in ("random", "runs"):
            sorted_gather_bench(1 << 22, 1, kind)  # postings-expansion regime
    if which in ("all", "e2"):
        for kind in ("flat", "pair", "rows"):
            sort_bench(kind)
    if which in ("all", "e3"):
        for T in (512, 4096, 8192):
            pallas_dyngather_bench(T)
    if which in ("all", "e4"):
        for depth in (1, 8, 16):
            pallas_dma_bench(depth=depth)


if __name__ == "__main__":
    main()
