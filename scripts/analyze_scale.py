"""Workload analysis of the skewed bench DB batches on CPU (no chip).

Reconstructs, for the bench's own query batches, exactly what the engine
schedules: per-query cold totals after run-dedup and hot-split, the phase-2
chunk plan (G, cap, hot) with real vs padded expansion rows, host-fallback
rows, and the hot-set dense volume.  From these it prints a cost-model
device budget (CLAUDE.md gather-rate model) to compare against the measured
end-to-end batch time -- the scheduling is byte-identical to serving because
it IS the engine's scheduler, run on the CPU backend with _dispatch_group
stubbed out.

Run: python scripts/analyze_scale.py [n_proteins=1000000] [n_queries=2048]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from bench import CACHE_ROOT, build_skewed_db, ensure_db, make_queries
from kaamer_tpu.search.engine import (
    HOT_DENSE_BYTES, SearchEngine, _next_pow2, KMER_SIZE,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

path = os.path.join(CACHE_ROOT, f"skew_{N}")
art = ensure_db(path, build_skewed_db, N)
engine = SearchEngine(art)
rng = np.random.default_rng(99)
queries = make_queries(art, rng, n_queries=NQ)
sizes = [len(q) - 6 for q in queries]

# --- stub the phase-2 dispatch: record the plan, run nothing -----------------
plan = []


def record_group(outs1, rows, G, cap, k_full, L, positions, hot=False,
                 identity=False):
    plan.append({"rows": list(rows), "G": int(G), "cap": int(cap),
                 "hot": bool(hot), "identity": bool(identity), "L": int(L)})
    return None


engine._dispatch_group = record_group

handle = engine.dispatch_batch(queries, sizes, k=10)
outs1 = handle[0]
totals = np.asarray(outs1[5])[: len(sizes)]
hot_sums = np.asarray(outs1[6])[: len(sizes)]

t0 = time.perf_counter()
sched = engine.schedule_batch(handle)
t_sched = time.perf_counter() - t0
pending, results, _, B_real, _ = sched

host_fallback_rows = len(results)

# --- totals / plan statistics ------------------------------------------------
B = len(sizes)
L = _next_pow2(max(max(sizes), 8))
real_rows = int(totals.sum())
pad_rows = 0
disp_rows = 0
hot_groups = cold_groups = 0
hot_dense_bytes = 0
hot_queries = int((hot_sums > 0).sum())
cap_hist = {}
H = int(engine.hot_starts.shape[0]) if engine.hot_starts is not None else 0
P_pad = int(engine.M.shape[1]) if engine.M is not None else 0

for ch in plan:
    G, cap, hot = ch["G"], ch["cap"], ch["hot"]
    n_real = len(ch["rows"]) if not ch["identity"] else B_real
    disp_rows += G * cap
    t_real = int(totals[[r for r in ch["rows"] if r < B_real]].sum()
                 ) if not ch["identity"] else real_rows
    pad_rows += G * cap - t_real
    key = (cap, hot)
    cap_hist[key] = cap_hist.get(key, 0) + 1
    if hot:
        hot_groups += 1
        # counts_hot f32[G, P_pad] write + topk read + [G, L, H] indicator
        hot_dense_bytes += 4 * G * P_pad * 2 + 4 * G * ch["L"] * H
    else:
        cold_groups += 1

GATHER_ROWS_PER_S = 42e6   # CLAUDE.md big-table gather rate (v5e)
HBM_BW = 819e9             # v5e HBM bandwidth
probe_rows = 2 * B * L

budget = {
    "db": N, "batch": B, "L": int(L),
    "hot": {"H": H, "P_pad": P_pad, "thresh": int(engine.hot_thresh),
            "hot_queries": hot_queries, "hot_groups": hot_groups,
            "dense_gb_per_batch": round(hot_dense_bytes / 1e9, 3),
            "est_dense_s": round(hot_dense_bytes / HBM_BW, 4)},
    "cold": {"real_rows": real_rows,
             "dispatched_rows": disp_rows,
             "padding_rows": disp_rows - real_rows,
             "padding_frac": round(1 - real_rows / max(disp_rows, 1), 3),
             "est_gather_s": round(disp_rows / GATHER_ROWS_PER_S, 4)},
    "probe": {"rows": probe_rows,
              "est_s": round(probe_rows / GATHER_ROWS_PER_S, 4)},
    "dispatches": len(plan),
    "est_dispatch_s": round(len(plan) * 1e-3, 4),
    "host_fallback_rows": host_fallback_rows,
    "sched_host_s": round(t_sched, 4),
    "totals_quantiles": {q: int(np.quantile(totals, q / 100))
                         for q in (50, 90, 99, 100)},
    "cap_hist": {f"cap={c}{' hot' if h else ''}": n
                 for (c, h), n in sorted(cap_hist.items())},
}
est = (budget["hot"]["est_dense_s"] + budget["cold"]["est_gather_s"]
       + budget["probe"]["est_s"] + budget["est_dispatch_s"])
budget["est_batch_s"] = round(est, 4)
budget["est_qps"] = round(B / est, 1)
print(json.dumps(budget, indent=1))
