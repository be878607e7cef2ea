"""POSITIONS_BUDGET: attribute the positions=True cost at 100k proteins
(the web UI's default shape; VERDICT r4 weak #7 -- the 14.5-18.6k q/s
swing had no stage budget).

Stages measured on the chip, scale_floor style (amortized loops, closed by
a device_get):

  e2e_plain      pipelined batches, positions=False
  e2e_pos        pipelined batches, positions=True (device bitmaps)
  p2_delta       per-chunk device cost of the SAME phase-2 chunks with and
                 without the bitmap tail (member_bitmap_from_rows +
                 expand_run_bitmaps + pack_bits [+ hot bitmaps])
  wire_bytes     extra device->host bytes of the packed bitmaps
  host_finalize  host wall inside collect_batch (unpackbits + attach)

Writes POSITIONS_BUDGET_r05.json at the repo root.
Run: python scripts/positions_probe.py [n=100000] [n_queries=4096]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".bench_cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import BATCH, CACHE_ROOT, build_skewed_db, ensure_db, make_queries
from kaamer_tpu.search import engine as eng_mod
from kaamer_tpu.search.engine import SearchEngine

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

art = ensure_db(os.path.join(CACHE_ROOT, f"skew_{N}"), build_skewed_db, N)
engine = SearchEngine(art)
rng = np.random.default_rng(99)
queries = make_queries(art, rng, n_queries=NQ)
sizes = [len(q) - 6 for q in queries]
out = {"db": f"skew_{N}", "n_queries": NQ, "batch": BATCH}


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


def run_full(positions):
    hs = [engine.dispatch_batch(q, s, k=10, positions=positions)
          for q, s in batches()]
    ss = [engine.schedule_batch(h) for h in hs]
    for s_ in ss:
        engine.collect_batch(s_)


for pos in (False, True):  # warm/compile both grids
    run_full(pos)

t_plain = timed(lambda: run_full(False))
t_pos = timed(lambda: run_full(True))
out["e2e_plain_s"] = round(t_plain, 4)
out["e2e_plain_qps"] = round(NQ / t_plain, 1)
out["e2e_pos_s"] = round(t_pos, 4)
out["e2e_pos_qps"] = round(NQ / t_pos, 1)

# --- per-chunk device delta + wire bytes ------------------------------------
plan = []
orig = SearchEngine._dispatch_group


def rec(self, outs1, rows, G, cap_s, cap_t, k_full, L, positions, hot=False,
        identity=False, legacy=False):
    plan.append((outs1, list(rows), G, cap_s, cap_t, k_full, L, hot,
                 identity))
    return orig(self, outs1, rows, G, cap_s, cap_t, k_full, L, positions,
                hot, identity=identity, legacy=legacy)


engine._dispatch_group = rec.__get__(engine)
hs = [engine.dispatch_batch(q, s, k=10, positions=True)
      for q, s in batches()]
ss = [engine.schedule_batch(h) for h in hs]
engine._dispatch_group = orig.__get__(engine)
for s_ in ss:
    engine.collect_batch(s_)

REPS = 6
dev = {False: 0.0, True: 0.0}
wire_bytes = 0
for outs1, rows, G, cap_s, cap_t, k_full, Lc, hot, identity in plan:
    for pos in (False, True):
        def once():
            return orig(engine, outs1, rows, G, cap_s, cap_t, k_full, Lc,
                        pos, hot, identity=identity)[0][0]
        once()
        t0 = time.perf_counter()
        objs = [once() for _ in range(REPS)]
        jax.device_get([o[0, 0] for o in objs])
        dev[pos] += (time.perf_counter() - t0) / REPS
    wire_bytes += G * k_full * (Lc // 8)
out["p2_device_plain_s"] = round(dev[False], 4)
out["p2_device_pos_s"] = round(dev[True], 4)
out["p2_device_delta_s"] = round(dev[True] - dev[False], 4)
out["bitmap_wire_mb"] = round(wire_bytes / 1e6, 2)
out["n_chunks"] = len(plan)

# --- host finalize share ----------------------------------------------------
orig_fin = eng_mod._finalize_pending
acc = [0.0]


def timed_fin(*a, **k):
    t0 = time.perf_counter()
    r = orig_fin(*a, **k)
    acc[0] += time.perf_counter() - t0
    return r


eng_mod._finalize_pending = timed_fin
for pos in (False, True):
    acc[0] = 0.0
    run_full(pos)
    out[f"host_finalize_{'pos' if pos else 'plain'}_s"] = round(acc[0], 4)
eng_mod._finalize_pending = orig_fin

out["read_as"] = (
    "e2e_pos - e2e_plain should decompose into p2_device_delta (the bitmap "
    "matmul+pack tail), the bitmap wire transfer, and the host_finalize "
    "delta (unpackbits + per-query attach); whichever dominates is the "
    "next positions lever")
path = os.path.join(REPO, "POSITIONS_BUDGET_r05.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
print(f"wrote {path}", file=sys.stderr)
