"""Where does the end-to-end batch budget go on the skewed bench DB?

Times, with the SAME pipelined dispatch discipline as bench.py (blocking
single-call timings over the tunnel lie, CLAUDE.md):

  p1        phase 1 only: upload + probe/dedup/totals + totals device_get
  probe     a probe-only jit (unpack + encode + 2-gather cuckoo probe +
            checksum), isolating the gather cost from dedup/cumsum
  full      dispatch + schedule + collect (the bench path)
  sched     dispatch + schedule, collect skipped (no host finalization)

Run: python scripts/profile_phases.py [db_path]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import BATCH, make_queries
from kaamer_tpu import codec, native
from kaamer_tpu.index.artifact import load_db
from kaamer_tpu.ops.probe import probe_slices
from kaamer_tpu.search.engine import KMER_SIZE, SearchEngine

db_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kaamer_bench_skew_10000"
art = load_db(db_path)
engine = SearchEngine(art)
rng = np.random.default_rng(99)
N = 8192
queries = make_queries(art, rng, n_queries=N)
sizes = [len(q) - 6 for q in queries]
print(f"db={db_path} n_kmers_table=2^{art.hash_log2} rows "
      f"table_bytes={art.hash_table.nbytes/1e6:.1f}MB "
      f"postings={art.postings.nbytes/1e6:.1f}MB", flush=True)


def batches():
    for i in range(0, N, BATCH):
        yield queries[i : i + BATCH], sizes[i : i + BATCH]


def timed(label, fn, passes=3):
    fn()  # warm
    best = None
    for _ in range(passes):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:8s} {best*1e3:8.1f} ms  {N/best:9.1f} q/s  "
          f"{N/best*(sizes[0]):,.0f} kmer/s", flush=True)
    return best


# --- p1 only ---------------------------------------------------------------
def run_p1():
    hs = [engine.dispatch_batch(q, s, k=10) for q, s in batches()]
    for h in hs:
        jax.device_get((h[0][5], h[0][6]))

# --- probe only ------------------------------------------------------------
L = 256
width = L + KMER_SIZE - 1

@partial(jax.jit, static_argnames=("w",))
def probe_only(table, wire, w):
    codes = codec.unpack_codes7_jnp(wire, w)
    kmers = jax.vmap(lambda c: codec.encode_kmers_jnp(c.astype(jnp.int32), L))(codes)
    starts, lens = probe_slices(table, kmers, engine.hash_log2,
                                engine.miss_start)
    return starts.sum(dtype=jnp.uint32) + lens.sum(dtype=jnp.uint32)

wires = []
for q, s in batches():
    w = native.pack_queries(q, width)
    if w is None:
        w = codec.pack_codes7(codec.pad_codes_batch(q, width))
    wires.append(jnp.asarray(w))

def run_probe():
    outs = [probe_only(engine.table, w, width) for w in wires]
    jax.device_get(outs)

# --- full / sched ----------------------------------------------------------
def run_full():
    hs = [engine.dispatch_batch(q, s, k=10) for q, s in batches()]
    ss = [engine.schedule_batch(h) for h in hs]
    for s_ in ss:
        engine.collect_batch(s_)

def run_sched():
    hs = [engine.dispatch_batch(q, s, k=10) for q, s in batches()]
    ss = [engine.schedule_batch(h) for h in hs]
    # drain device without host finalization
    for s_ in ss:
        for rows, (outs2, pos_dev) in s_[0]:
            jax.device_get(outs2[0])

timed("probe", run_probe)
timed("p1", run_p1)
timed("sched", run_sched)
timed("full", run_full)
