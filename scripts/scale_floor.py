"""SCALE_FLOOR: committed phase budget for the skewed-1M 2048-query batch.

Applies the PROBE_FLOOR methodology one level up: every term of the
end-to-end batch time is measured on the chip with amortized multi-rep
loops closed by a small device_get (single-pass tunnel timings lie,
CLAUDE.md), then compared against the end-to-end pipelined rate and the
gather-rate cost model.  Terms:

  probe       probe-only jit (unpack + encode + cuckoo probe + checksum)
  p1          full phase 1 (probe + dedup + totals) incl. upload
  p2[class]   every phase-2 chunk the scheduler emitted, re-dispatched on
              its REAL inputs, grouped by (hot, cap decade); per-class ms
              and gathered-row volume
  gather_ref  standalone random-row gather from THIS postings array at a
              dominant [G, cap] shape (the hardware wall the cold
              expansion is supposed to sit at)
  sched_host  host wall time inside schedule_batch (group building +
              async dispatch issue)
  e2e         pipelined dispatch->schedule->collect over all batches

Writes SCALE_FLOOR_r05.json at the repo root.
Run: python scripts/scale_floor.py [db] [n_queries=2048]
"""

import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".bench_cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from functools import partial

from bench import BATCH, CACHE_ROOT, build_skewed_db, ensure_db, make_queries
from kaamer_tpu import codec, native
from kaamer_tpu.ops.probe import probe_slices
from kaamer_tpu.search.engine import KMER_SIZE, SearchEngine, _next_pow2

db_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    CACHE_ROOT, "skew_1000000")
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

art = ensure_db(db_path, build_skewed_db, 1_000_000)
engine = SearchEngine(art)
rng = np.random.default_rng(99)
queries = make_queries(art, rng, n_queries=NQ)
sizes = [len(q) - 6 for q in queries]
out = {"db": db_path, "n_queries": NQ, "batch": BATCH,
       "table_mb": round(art.hash_table.nbytes / 1e6, 1),
       "postings_mb": round(art.postings.nbytes / 1e6, 1),
       "H": int(engine.hot_starts.shape[0]) if engine.hot_starts is not None
       else 0,
       "hot_thresh": int(engine.hot_thresh)}


def batches():
    for i in range(0, NQ, BATCH):
        yield queries[i : i + BATCH], sizes[i : i + BATCH]


def timed(fn, passes=3):
    fn()
    best = None
    for _ in range(passes):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


# --- probe / p1 --------------------------------------------------------------
L = 256
width = L + KMER_SIZE - 1


@partial(jax.jit, static_argnames=("w",))
def probe_only(table, wire, w):
    codes = codec.unpack_codes7_jnp(wire, w)
    kmers = jax.vmap(
        lambda c: codec.encode_kmers_jnp(c.astype(jnp.int32), L))(codes)
    starts, lens = probe_slices(table, kmers, engine.hash_log2,
                                engine.miss_start)
    return starts.sum(dtype=jnp.uint32) + lens.sum(dtype=jnp.uint32)


wires = []
for q, s in batches():
    w = native.pack_queries(q, width)
    wires.append(jnp.asarray(w if w is not None
                             else codec.pack_codes7(codec.pad_codes_batch(q, width))))

out["probe_s"] = round(timed(lambda: jax.device_get(
    [probe_only(engine.table, w, width) for w in wires])), 4)

out["p1_s"] = round(timed(lambda: jax.device_get(
    [engine.dispatch_batch(q, s, k=10)[0][7] for q, s in batches()])), 4)

# --- capture the scheduler's plan on real phase-1 outputs --------------------
plan = []   # (outs1, rows, G, cap_s, cap_t, k_full, L, positions, hot, id)
orig_dispatch = SearchEngine._dispatch_group


def recording_dispatch(self, outs1, rows, G, cap_s, cap_t, k_full, L,
                       positions, hot=False, identity=False, legacy=False):
    plan.append((outs1, list(rows), G, cap_s, cap_t, k_full, L, positions,
                 hot, identity))
    return orig_dispatch(self, outs1, rows, G, cap_s, cap_t, k_full, L,
                         positions, hot, identity=identity, legacy=legacy)


handles = [engine.dispatch_batch(q, s, k=10) for q, s in batches()]
engine._dispatch_group = recording_dispatch.__get__(engine)
t0 = time.perf_counter()
scheds = [engine.schedule_batch(h) for h in handles]
sched_host_s = time.perf_counter() - t0
engine._dispatch_group = orig_dispatch.__get__(engine)
for s_ in scheds:
    engine.collect_batch(s_)
out["schedule_host_s_all_batches"] = round(sched_host_s, 4)
out["phase2_dispatches"] = len(plan)

# --- per-class phase-2 device time -------------------------------------------
# re-dispatch each recorded chunk on its real inputs; amortized REPS loop
REPS = 6
classes = defaultdict(lambda: {"chunks": 0, "rows_dispatched": 0,
                               "rows_real": 0, "s": 0.0})
for outs1, rows, G, cap_s, cap_t, k_full, Lc, positions, hot, identity \
        in plan:
    cap_e = cap_s + 128 * cap_t
    key = (f"{'hot' if hot else 'cold'} "
           f"cap<={1 << max(10, (cap_e - 1).bit_length())}")
    c = classes[key]
    c["chunks"] += 1
    c["rows_dispatched"] += G * cap_e

    def once(outs1=outs1, rows=rows, G=G, cap_s=cap_s, cap_t=cap_t,
             k_full=k_full, Lc=Lc, positions=positions, hot=hot,
             identity=identity):
        outs2 = orig_dispatch(engine, outs1, rows, G, cap_s, cap_t,
                              k_full, Lc, positions, hot,
                              identity=identity)[0]
        return outs2[0]

    once()  # warm (compiled already during scheduling)
    t0 = time.perf_counter()
    objs = [once() for _ in range(REPS)]
    jax.device_get([o[0, 0] for o in objs])
    c["s"] += (time.perf_counter() - t0) / REPS

# real rows per class from phase-1 totals
for (outs1, rows, G, cap_s, cap_t, k_full, Lc, positions, hot,
     identity) in plan:
    cap_e = cap_s + 128 * cap_t
    key = (f"{'hot' if hot else 'cold'} "
           f"cap<={1 << max(10, (cap_e - 1).bit_length())}")
    # real dispatch lanes: short elements + 128 per real tile row
    lanes = np.asarray(outs1[7]) + 128 * np.asarray(outs1[8])
    classes[key]["rows_real"] += int(lanes[rows].sum())

out["phase2_classes"] = {
    k: {"chunks": v["chunks"], "ms": round(v["s"] * 1e3, 1),
        "rows_dispatched_m": round(v["rows_dispatched"] / 1e6, 2),
        "rows_real_m": round(v["rows_real"] / 1e6, 2),
        "gather_rows_per_s_m": round(
            v["rows_dispatched"] / max(v["s"], 1e-9) / 1e6, 1)}
    for k, v in sorted(classes.items())
}
out["phase2_sum_s"] = round(sum(v["s"] for v in classes.values()), 4)

# --- reference gather wall on THIS postings array ----------------------------
G_ref, cap_ref = 256, 12288
src = jnp.asarray(
    np.random.default_rng(0).integers(
        0, art.postings.shape[0], size=(G_ref, cap_ref)).astype(np.int32))


@jax.jit
def gather_ref(postings, src):
    return jnp.take(postings, src.reshape(-1)).reshape(src.shape).sum(
        axis=1, dtype=jnp.uint32)


n_loop = 20
gather_ref(engine.postings, src)


def run_gather():
    objs = [gather_ref(engine.postings, src) for _ in range(n_loop)]
    jax.device_get([o[0] for o in objs])


t_g = timed(run_gather)
out["gather_ref_rows_per_s_m"] = round(
    G_ref * cap_ref * n_loop / t_g / 1e6, 1)

# --- schedule host time, post-compile ----------------------------------------
handles2 = [engine.dispatch_batch(q, s, k=10) for q, s in batches()]
jax.device_get([h[0][7] for h in handles2])  # totals ready
t0 = time.perf_counter()
scheds2 = [engine.schedule_batch(h) for h in handles2]
out["schedule_host_warm_s_all_batches"] = round(time.perf_counter() - t0, 4)
for s_ in scheds2:
    engine.collect_batch(s_)


# --- end to end ---------------------------------------------------------------
# count TAM-certificate legacy reruns (collect_batch re-dispatches) so the
# artifact records how much work the certificate sends down the slow path
_rerun_rows = []
_orig_legacy = engine._dispatch_legacy
engine._dispatch_legacy = (
    lambda ctx, fl: _rerun_rows.append(len(fl)) or _orig_legacy(ctx, fl))


def run_full():
    hs = [engine.dispatch_batch(q, s, k=10) for q, s in batches()]
    ss = [engine.schedule_batch(h) for h in hs]
    ss = [engine.prefetch_batch(s_) for s_ in ss]  # serving-loop protocol
    for s_ in ss:
        engine.collect_batch(s_)


t_full = timed(run_full)
out["e2e_s"] = round(t_full, 4)
out["e2e_qps"] = round(NQ / t_full, 1)
out["tam_rerun_rows_total_all_passes"] = int(sum(_rerun_rows))
out["tam_rerun_dispatches"] = len(_rerun_rows)
out["read_as"] = (
    "e2e per-batch time vs the sum of its measured parts; phase2 classes "
    "carry their own gathered-row rate to compare against gather_ref (the "
    "hardware wall for this postings array)")

path = os.path.join(REPO, "SCALE_FLOOR_r05.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
print(f"wrote {path}", file=sys.stderr)
