"""Hot-path phase-2 stage timings at 1M scale (synthetic inputs, fixed
device_get-closed timing).  SCALE_FLOOR_r04's hot classes run at
~324 ms/chunk (cap<=32768) against a ~15 ms roofline sum; this isolates
which stage eats it: the dense [G,P] hot_at_cold gather (suspect), the
W@M stream, topk_dense, the merge re-sort, or the cold expansion inside
the hot kernel.

Usage: python scripts/hot_stage_probe.py [G] [cap]
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
os.makedirs(os.path.join(REPO, ".bench_cache", "jax"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".bench_cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kaamer_tpu.ops import count as C
from kaamer_tpu.ops import hotset as HS
from kaamer_tpu.search.engine import _phase2_hot_impl

G = int(sys.argv[1]) if len(sys.argv) > 1 else 64
cap = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
L = 256
NPOST = 80_000_000
H = 2048
P_pad = 1 << 20
k_full = 16
PACK_BITS = max(int(L).bit_length(), 1)
REPS = 10

rng = np.random.default_rng(5)
postings_d = ((jnp.arange(NPOST, dtype=jnp.uint32) * jnp.uint32(2654435761))
              % jnp.uint32(1_000_000))

hot_starts_np = np.sort(rng.choice(NPOST, size=H, replace=False)
                        .astype(np.int32))
hot_starts_d = jnp.asarray(hot_starts_np)


@jax.jit
def _mk_M():
    return (((jnp.arange(H, dtype=jnp.uint32)[:, None] * 7919
              + jnp.arange(P_pad, dtype=jnp.uint32)[None, :] * 104729)
             & 15) == 0).astype(jnp.bfloat16)


M_d = _mk_M()
MT_d = jax.jit(lambda m: m.T)(M_d)

# synthetic phase-1 rows: ~100 runs/query, ~15% of runs hot
run_pos_len = rng.integers(1, 5, size=(G, L))
offs = np.zeros((G, L), np.int32)
lens_u = np.zeros((G, L), np.int32)
wstart = np.zeros((G, L), np.int32)
run_start = np.zeros((G, L), np.int32)
whot = np.zeros((G, L), np.int32)
for g in range(G):
    lane = 0
    raw = []
    while lane < L:
        w = int(run_pos_len[g, lane % L])
        w = min(w, L - lane)
        raw.append((lane, w))
        lane += w
    n_runs = len(raw)
    plen = (rng.pareto(1.2, size=n_runs) + 1)
    plen = plen / plen.sum() * (0.72 * cap)
    plen = np.maximum(plen.astype(np.int64), 1)
    over = plen.sum() - int(0.95 * cap)
    if over > 0:
        order = np.argsort(-plen)
        for i in order:
            cut = min(over, plen[i] - 1)
            plen[i] -= cut
            over -= cut
            if over <= 0:
                break
    hot_runs = rng.random(n_runs) < 0.15
    for (lane0, w), pl, ish in zip(raw, plen, hot_runs):
        wstart[g, lane0] = w
        run_start[g, lane0 : lane0 + w] = lane0
        if ish:
            hs = hot_starts_np[rng.integers(0, H)]
            offs[g, lane0 : lane0 + w] = hs
            whot[g, lane0] = w
        else:
            offs[g, lane0 : lane0 + w] = rng.integers(0, NPOST - (1 << 17))
            lens_u[g, lane0] = pl
cum = np.cumsum(lens_u, axis=1).astype(np.int32)

offs_d = jnp.asarray(offs)
cum_d = jnp.asarray(cum)
w_d = jnp.asarray(wstart)
rs_d = jnp.asarray(run_start)
wh_d = jnp.asarray(whot)
total_d = cum_d[:, -1]


def _close(o):
    while isinstance(o, (tuple, list)):
        o = o[0]
    return np.asarray(o.reshape(-1)[:1])


def timed(fn, reps=REPS):
    _close(fn())
    _close(fn())
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        objs = [fn() for _ in range(reps)]
        _close(objs[-1])
        dt = (time.perf_counter() - t0) / reps
        best = dt if best is None else min(best, dt)
    return best


out = {"G": G, "cap": cap, "L": L, "H": H, "P_pad": P_pad,
       "cold_rows_mean": float(np.asarray(total_d).mean()),
       "hot_w_mean": float(whot.sum(1).mean())}


def save():
    o = {k: (round(v, 3) if isinstance(v, float) else v)
         for k, v in out.items()}
    with open(os.path.join(REPO, ".bench_cache",
                           f"hot_stages_G{G}_cap{cap}.json"), "w") as f:
        json.dump(o, f, indent=1)
    print(json.dumps(o), flush=True)


# full production hot kernel
hot_j = jax.jit(partial(_phase2_hot_impl, cap=cap, k=k_full, positions=False,
                        pack_w_bits=PACK_BITS))
out["full_hot_ms"] = timed(lambda: hot_j(
    postings_d, M_d, MT_d, hot_starts_d, offs_d, cum_d, w_d, rs_d,
    wh_d)) * 1e3; save()

# stages
gp_j = jax.jit(lambda p, o, c, t, w: C.gather_postings(
    p, o, c, t, cap, wstart=w))
out["gather_postings_ms"] = timed(
    lambda: gp_j(postings_d, offs_d, cum_d, total_d, w_d)) * 1e3; save()
rows_ref, seg_ref, valid_ref, wexp_ref = gp_j(postings_d, offs_d, cum_d,
                                              total_d, w_d)

sr_j = jax.jit(lambda r, w: C.sort_rle(r, w, pack_w_bits=PACK_BITS))
out["sort_rle_ms"] = timed(lambda: sr_j(rows_ref, wexp_ref)) * 1e3; save()
s_rows_d, cold_counts_d, is_start_d = sr_j(rows_ref, wexp_ref)

hw_j = jax.jit(lambda o, w: HS.hot_weights(o, w, hot_starts_d))
out["hotW_ms"] = timed(lambda: hw_j(offs_d, wh_d)) * 1e3; save()
W_d = hw_j(offs_d, wh_d)

mm_j = jax.jit(lambda w, m: HS.hot_matmul(w, m, max_w=L))
out["hotMM_ms"] = timed(lambda: mm_j(W_d, M_d)) * 1e3; save()
counts_hot = mm_j(W_d, M_d)

tk_j = jax.jit(lambda c: HS.topk_dense(c, k_full))
out["topk_dense_ms"] = timed(lambda: tk_j(counts_hot)) * 1e3; save()

safe = jnp.minimum(s_rows_d, np.uint32(P_pad - 1)).astype(jnp.int32)
hac_j = jax.jit(lambda ch, s: jnp.take_along_axis(ch, s, axis=1))
out["hot_at_cold_gather_ms"] = timed(
    lambda: hac_j(counts_hot, safe)) * 1e3; save()

mg_j = jax.jit(lambda ch, s, cc, ist: HS.merge_hot_cold(
    ch, s, cc, ist, k_full, pack_w_bits=PACK_BITS))
out["merge_hot_cold_ms"] = timed(
    lambda: mg_j(counts_hot, s_rows_d, cold_counts_d, is_start_d)) * 1e3
save()
