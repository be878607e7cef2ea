"""Per-stage device timing for the fused search step (bench shapes)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from functools import partial

from bench import build_synthetic_db, make_queries, BATCH
from kaamer_tpu.index.artifact import load_db
from kaamer_tpu.search.engine import (
    KMER_SIZE, SearchEngine, _next_pow2, _phase1_impl, _phase2_impl,
)
from kaamer_tpu.ops.count import count_topk, gather_postings
from kaamer_tpu import codec

db_path = os.environ.get("KAAMER_BENCH_DB", "/tmp/kaamer_bench_db")
art = load_db(db_path)
engine = SearchEngine(art)
rng = np.random.default_rng(99)
queries = make_queries(art, rng)
sizes = [len(q) - 6 for q in queries]

B = BATCH
L = _next_pow2(max(max(sizes[:B]), 8))
codes = np.full((B, L + KMER_SIZE - 1), -1, dtype=np.int8)
for i, s in enumerate(queries[:B]):
    c = codec.seq_to_codes(s)[: L + KMER_SIZE - 1]
    codes[i, : c.shape[0]] = c
codes_dev = jnp.asarray(codes)
n_dev = jnp.asarray(np.asarray(sizes[:B], dtype=np.int32))
CAP, K = 1024, 32


def timeit(name, fn, *args, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    print(f"{name:24s} {dt*1e3:8.2f} ms", flush=True)
    return out


p1 = jax.jit(partial(_phase1_impl, hash_log2=engine.hash_log2,
                     miss_start=engine.miss_start))
offs, cum, wstart, run_start, totals = timeit(
    "phase1 (probe)", p1, engine.table, codes_dev, n_dev)

gp = jax.jit(partial(gather_postings, cap=CAP))
total = cum[:, -1]
rows, seg, valid = timeit("gather_postings", gp, engine.postings, offs, cum, total)

ct = jax.jit(partial(count_topk, k=K))
timeit("count_topk (sort+rle)", ct, rows)

# raw sort alone for reference
srt = jax.jit(lambda r: jnp.sort(r, axis=1))
timeit("  jnp.sort only", srt, rows)

p2 = jax.jit(partial(
    __import__("kaamer_tpu.search.engine", fromlist=["x"])._phase2_grouped_impl,
    cap=CAP, k=K))
timeit("phase2 grouped", p2, engine.postings, offs, cum, wstart, run_start)
