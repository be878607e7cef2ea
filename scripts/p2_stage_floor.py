"""Per-STAGE device timing of one phase-2 chunk at the shapes that dominate
SCALE_FLOOR_r04 (hot cap<=32768 at 324ms/chunk vs a ~15ms roofline sum).

Times, at a given (G, cap, L) on the skewed-1M artifact, each stage of
_phase2_hot_impl / _phase2_grouped_impl in isolation (amortized REPS loops
closed by a tiny device_get, per CLAUDE.md timing rules):

  gather   gather_postings (seg computation + postings row gather)
  sort     sort_rle's lax.sort((rows, weights)) two-operand sort
  sort1    single-operand jnp.sort of the same rows (what a packed-key
           sort would cost)
  rle      sort_rle minus the sort (cummin/cumsum RLE passes)
  topk     count_topk minus sort_rle (lax.top_k + row gather)
  hotW     hot_weights one-hot einsum [G, L, H]
  hotMM    hot_matmul W @ M (streams the full membership matrix)
  merge    merge_hot_cold (dense top-k + candidate union)
  full     the production _p2h jit

Run AFTER the engine exists: python scripts/p2_stage_floor.py [G] [cap]
"""
# NOTE: this probe measured the PRE-hybrid phase-2 kernels (results
# captured in .bench_cache and discussed in docs/performance.md /
# SCALE_FLOOR history).  The kernels changed signature with the two-tier
# expansion (ops/count.expand_hybrid); use scripts/hybrid_p2_probe.py for
# current-kernel stage timings.
import sys as _sys
_sys.exit("superseded by scripts/hybrid_p2_probe.py (kernel signatures "
          "changed with the two-tier expansion); see module note")


import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".bench_cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import BATCH, CACHE_ROOT, build_skewed_db, ensure_db, make_queries
from kaamer_tpu.ops import count as C
from kaamer_tpu.ops import hotset as HS
from kaamer_tpu.search.engine import SearchEngine

G = int(sys.argv[1]) if len(sys.argv) > 1 else 64
cap = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
NP_DB = 1_000_000

art = ensure_db(os.path.join(CACHE_ROOT, f"skew_{NP_DB}"),
                build_skewed_db, NP_DB)
engine = SearchEngine(art)
rng = np.random.default_rng(7)
queries = make_queries(art, rng, n_queries=BATCH)
sizes = [len(q) - 6 for q in queries]

# real phase-1 outputs for a batch; pick the G heaviest rows so the chunk
# resembles the scheduler's heavy-cap groups
handle = engine.dispatch_batch(queries, sizes, k=10)
outs1 = handle[0]
totals_h = np.asarray(outs1[5])
rows_sel = np.argsort(-totals_h)[:G].astype(np.int32)
offs, cum, wstart, run_start, whot = (
    np.asarray(jnp.take(o, jnp.asarray(rows_sel), axis=0)) for o in outs1[:5])
L = offs.shape[1]
k_full = 16

offs_d = jnp.asarray(offs)
cum_d = jnp.asarray(cum)
w_d = jnp.asarray(wstart)
rs_d = jnp.asarray(run_start)
wh_d = jnp.asarray(whot)
total_d = cum_d[:, -1]

REPS = 10


def timed(fn, reps=REPS):
    fn()  # warm/compile
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        objs = [fn() for _ in range(reps)]
        jax.block_until_ready(objs[-1])
        dt = (time.perf_counter() - t0) / reps
        best = dt if best is None else min(best, dt)
    return best


out = {"G": G, "cap": cap, "L": int(L), "H": int(engine.hot_starts.shape[0]),
       "P_pad": int(engine.M.shape[1]),
       "rows_total_mean": float(totals_h[rows_sel].mean())}

# --- gather ------------------------------------------------------------------
gather_j = jax.jit(partial(
    lambda p, o, c, t, w: C.gather_postings(p, o, c, t, cap, wstart=w)[0]))
out["gather_ms"] = timed(
    lambda: gather_j(engine.postings, offs_d, cum_d, total_d, w_d)) * 1e3

# materialize rows/weights once for downstream stages
rows_w = jax.jit(partial(
    lambda p, o, c, t, w: C.gather_postings(p, o, c, t, cap, wstart=w)))(
        engine.postings, offs_d, cum_d, total_d, w_d)
rows_d, seg_d, valid_d, wexp_d = (jnp.asarray(x) for x in rows_w)

# --- sort variants -----------------------------------------------------------
sort2_j = jax.jit(lambda r, w: jax.lax.sort((r, w), num_keys=1)[0])
out["sort2_ms"] = timed(lambda: sort2_j(rows_d, wexp_d)) * 1e3
sort1_j = jax.jit(lambda r: jnp.sort(r, axis=1))
out["sort1_ms"] = timed(lambda: sort1_j(rows_d)) * 1e3
# packed single-key variant: row << 10 | weight (weights are run position
# counts <= L <= 512; rows < P < 2^21 at 1M proteins)
pack_j = jax.jit(lambda r, w: jnp.sort(
    (r.astype(jnp.uint32) << jnp.uint32(10)) | w.astype(jnp.uint32), axis=1))
out["sort_packed_ms"] = timed(lambda: pack_j(rows_d, wexp_d)) * 1e3

# --- rle (sort_rle minus the sort) -------------------------------------------
s_d, w_s = jax.lax.sort((rows_d, wexp_d), num_keys=1)
rle_j = jax.jit(lambda s, w: C.sort_rle(s, w)[1])  # input pre-sorted: sort of
# sorted data is not free, so subtract sort2_ms when reading this number
out["sortrle_ms"] = timed(lambda: rle_j(rows_d, wexp_d)) * 1e3

# --- topk over counts --------------------------------------------------------
counts_lane = jax.jit(lambda s, w: C.sort_rle(s, w)[1])(rows_d, wexp_d)
topk_j = jax.jit(lambda c, s: jax.lax.top_k(c, k_full)[0])
out["topk_ms"] = timed(lambda: topk_j(counts_lane, s_d)) * 1e3

# --- hot stages --------------------------------------------------------------
hw_j = jax.jit(lambda o, w: HS.hot_weights(o, w, engine.hot_starts))
out["hotW_ms"] = timed(lambda: hw_j(offs_d, wh_d)) * 1e3
W_d = hw_j(offs_d, wh_d)
mm_j = jax.jit(lambda w, m: HS.hot_matmul(w, m, max_w=L))
out["hotMM_ms"] = timed(lambda: mm_j(W_d, engine.M)) * 1e3
counts_hot = mm_j(W_d, engine.M)
is_start = jax.jit(lambda s: jnp.concatenate(
    [jnp.ones_like(s[:, :1], dtype=bool), s[:, 1:] != s[:, :-1]], axis=1)
    & (s != C.ROW_SENTINEL))(s_d)
merge_j = jax.jit(lambda ch, s, cc, ist: HS.merge_hot_cold(
    ch, s, cc, ist, k_full))
out["merge_ms"] = timed(
    lambda: merge_j(counts_hot, s_d, counts_lane, is_start)) * 1e3

# --- full fused kernels ------------------------------------------------------
from kaamer_tpu.search.engine import _phase2_grouped_impl, _phase2_hot_impl

cold_j = jax.jit(partial(_phase2_grouped_impl, cap=cap, k=min(k_full, cap),
                         positions=False))
out["full_cold_ms"] = timed(lambda: cold_j(
    engine.postings, offs_d, cum_d, w_d, rs_d)) * 1e3
hot_j = jax.jit(partial(_phase2_hot_impl, cap=cap, k=k_full, positions=False))
out["full_hot_ms"] = timed(lambda: hot_j(
    engine.postings, engine.M, engine.MT, engine.hot_starts,
    offs_d, cum_d, w_d, rs_d, wh_d)) * 1e3

for k in out:
    if k.endswith("_ms"):
        out[k] = round(out[k], 2)
print(json.dumps(out, indent=1))
with open(os.path.join(REPO, ".bench_cache", f"p2_stages_G{G}_cap{cap}.json"),
          "w") as f:
    json.dump(out, f, indent=1)
