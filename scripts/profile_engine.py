"""Break down bench.py's per-batch time: device compute vs host overhead.

Times, for the bench workload shapes:
  1. pure device compute (fused jit, block_until_ready, steady state)
  2. dispatch+resolve through the engine (incl. host padding + device_get)
  3. host finalization only
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_synthetic_db, make_queries, BATCH, N_QUERIES
from kaamer_tpu.index.artifact import load_db
from kaamer_tpu.search.engine import SearchEngine

db_path = os.environ.get("KAAMER_BENCH_DB", "/tmp/kaamer_bench_db")
if not os.path.exists(os.path.join(db_path, "meta.json")):
    build_synthetic_db(db_path)

art = load_db(db_path)
engine = SearchEngine(art)
rng = np.random.default_rng(99)
queries = make_queries(art, rng)
sizes = [len(q) - 6 for q in queries]

# warmup (sets cap_hint)
engine.count_batch(queries[:BATCH], sizes[:BATCH], k=10)
print("cap_hint after warmup:", engine._cap_hint, flush=True)

import jax.numpy as jnp
from kaamer_tpu.search.engine import KMER_SIZE, _next_pow2
from kaamer_tpu import codec

B = BATCH
L = _next_pow2(max(max(sizes[:B]), 8))
codes = np.full((B, L + KMER_SIZE - 1), -1, dtype=np.int8)
for i, s in enumerate(queries[:B]):
    c = codec.seq_to_codes(s)[: L + KMER_SIZE - 1]
    codes[i, : c.shape[0]] = c
n_kmers = np.asarray(sizes[:B], dtype=np.int32)
codes_dev = jnp.asarray(codes)
n_dev = jnp.asarray(n_kmers)
cap = engine._cap_hint
k_eff = 32

# 1. pure device compute (phase 1 + one full-batch phase-2 group)
def full_step():
    outs1 = engine._p1(engine.table, codes_dev, n_dev)
    sel = (outs1[0], outs1[1], outs1[2], outs1[3])
    from kaamer_tpu.search.engine import _phase2_grouped_impl
    return engine._p2(engine.postings, *sel, cap=cap, k=k_eff)

out = full_step()
jax.block_until_ready(out)
t0 = time.perf_counter()
REPS = 10
for _ in range(REPS):
    out = full_step()
jax.block_until_ready(out)
dt_dev = (time.perf_counter() - t0) / REPS
print(f"device compute:        {dt_dev*1e3:8.2f} ms/batch  ({B/dt_dev:9.0f} q/s)", flush=True)

# 1b. host padding cost
t0 = time.perf_counter()
for _ in range(REPS):
    codes2 = np.full((B, L + KMER_SIZE - 1), -1, dtype=np.int8)
    for i, s in enumerate(queries[:B]):
        c = codec.seq_to_codes(s)[: L + KMER_SIZE - 1]
        codes2[i, : c.shape[0]] = c
dt_pad = (time.perf_counter() - t0) / REPS
print(f"host padding:          {dt_pad*1e3:8.2f} ms/batch", flush=True)

# 2. dispatch+resolve, pipelined like bench
t0 = time.perf_counter()
handles = []
for i in range(0, N_QUERIES, BATCH):
    handles.append(engine.dispatch_batch(queries[i:i+BATCH], sizes[i:i+BATCH], k=10))
    if len(handles) >= 2:
        engine.resolve_batch(handles.pop(0))
for h in handles:
    engine.resolve_batch(h)
dt_e2e = (time.perf_counter() - t0) / (N_QUERIES // BATCH)
print(f"engine e2e:            {dt_e2e*1e3:8.2f} ms/batch  ({B/dt_e2e:9.0f} q/s)", flush=True)

# 3. resolve-only (host finalization + phase-2 scheduling) on a batch
h = engine.dispatch_batch(queries[:BATCH], sizes[:BATCH], k=10)
jax.block_until_ready(h[0])
t0 = time.perf_counter()
engine.resolve_batch(h)
dt_res = time.perf_counter() - t0
print(f"resolve (host final):  {dt_res*1e3:8.2f} ms/batch", flush=True)
