"""What-if sweep over the hot-set count H on the skewed bench workload (CPU).

For each candidate H, recompute the hot threshold exactly as
hotset.select_hot_sets does (tie tier dropped), re-split each bench query's
runs into hot/cold host-side, re-run the ENGINE'S OWN scheduler on the
re-split totals (dispatch stubbed), and print the resulting cold expansion
volume / padding / dispatch count plus a cost-model batch estimate:

  est = probe + cold gather (42M rows/s) + dense (matmul flops + counts_hot
        HBM traffic) + dispatch overhead

Run: python scripts/sweep_hot_h.py [n_proteins=1000000] [n_queries=2048]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from bench import CACHE_ROOT, build_skewed_db, ensure_db, make_queries
from kaamer_tpu.search.engine import SearchEngine, _next_pow2

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

path = os.path.join(CACHE_ROOT, f"skew_{N}")
art = ensure_db(path, build_skewed_db, N)
engine = SearchEngine(art)
rng = np.random.default_rng(99)
queries = make_queries(art, rng, n_queries=NQ)
sizes = [len(q) - 6 for q in queries]

plan = []
engine._dispatch_group = (
    lambda outs1, rows, G, cap, k_full, L, positions, hot=False,
    identity=False: plan.append((list(rows), G, cap, hot, identity)))

handle = engine.dispatch_batch(queries, sizes, k=10)
(outs1, _sizes, k, L, positions, cap_pin) = handle
offs = np.asarray(outs1[0])
B, Lw = offs.shape
B_real = len(sizes)

# per-lane slice lens from the artifact (phase 1 masked padding to miss)
starts = engine.set_starts_np
ids = np.searchsorted(starts, offs.ravel(), side="left").reshape(offs.shape)
lens = (starts[np.minimum(ids + 1, starts.size - 1)].astype(np.int64)
        - starts[ids]).astype(np.int64)

# run dedup host-side: runs of consecutive equal offs count once
is_new = np.concatenate(
    [np.ones((B, 1), bool), offs[:, 1:] != offs[:, :-1]], axis=1)
lens_u = np.where(is_new, lens, 0)

set_lens = np.diff(engine.set_starts_np[:-1].astype(np.int64))
order = np.sort(set_lens)[::-1]

GATHER_ROWS_PER_S = 42e6
HBM_BW = 819e9
MXU_BF16 = 197e12 * 0.5   # ~50% MXU efficiency on these shapes
P_pad = -(-art.num_proteins // 128) * 128


def thresh_for_h(h):
    """select_hot_sets' threshold: H-th largest set length, tie tier
    dropped (hotset.py:77-89)."""
    if h >= order.size:
        return max(int(order[-1]), 24) if order.size else 1 << 30
    t = int(order[h - 1])
    if int((set_lens >= t).sum()) > h:
        t += 1
    return max(t, 24)


results = {}
for H in (536, 1024, 2048, 3072, 4096, 8192):
    T = thresh_for_h(H)
    hot_mask = lens >= T
    cold_u = np.where(hot_mask, 0, lens_u)
    totals = cold_u[:B_real].sum(axis=1).astype(np.int64)
    hot_q = int(((lens_u > 0) & hot_mask)[:B_real].any(axis=1).sum())

    # re-run the engine's scheduler on the re-split totals
    plan.clear()
    fake1 = list(outs1)
    t_arr = np.zeros(B, np.int32)
    t_arr[:B_real] = totals
    h_arr = np.zeros(B, np.int32)
    h_arr[:B_real] = ((lens_u > 0) & hot_mask)[:B_real].sum(axis=1)
    fake1[5], fake1[6] = t_arr, h_arr
    sched = engine.schedule_batch((tuple(fake1), sizes, k, L, positions, 0))
    n_fallback = len(sched[1])

    disp_rows = sum(g * cap for _, g, cap, _, _ in plan)
    real = int(totals.sum())
    n_hot_groups = sum(1 for _, g, cap, hot, _ in plan if hot)
    # dense: counts_hot f32[G, P_pad] write+read, W@M flops, M bf16 size
    g_hot = sum(g for _, g, cap, hot, _ in plan if hot)
    dense_bytes = 8 * g_hot * P_pad
    dense_flops = 2 * g_hot * H * P_pad
    est = ((2 * B * Lw) / GATHER_ROWS_PER_S          # probe
           + disp_rows / GATHER_ROWS_PER_S            # cold gather
           + dense_bytes / HBM_BW + dense_flops / MXU_BF16
           + len(plan) * 1e-3)                        # dispatch overhead
    results[H] = {
        "thresh": T, "hot_queries": hot_q,
        "cold_real_rows": real, "cold_disp_rows": int(disp_rows),
        "pad_frac": round(1 - real / max(disp_rows, 1), 3),
        "dispatches": len(plan), "hot_groups": n_hot_groups,
        "host_fallback": n_fallback,
        "M_bf16_gb": round(H * P_pad * 2 / 2**30, 2),
        "dense_flops_T": round(dense_flops / 1e12, 2),
        "est_batch_s": round(est, 4), "est_qps": round(B_real / est, 1),
    }
    print(f"H={H}: {json.dumps(results[H])}", flush=True)
