"""Time the NEW two-tier phase-2 kernel at the shapes the skewed-1M
scheduler emits, against the pre-hybrid reference measurements
(p2_synth_G256_cap16384_L256.json: full_cold 157.8 ms for the equivalent
single-tier chunk).

Synthetic inputs mirror the measured 1M workload: ~107 cold runs/query,
~1.6k short elements + ~47 tile rows (SCALE run-length histogram).

Usage: python scripts/hybrid_p2_probe.py [G] [cap_s] [cap_t]
"""

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
from kaamer_tpu.search.engine import T_SPLIT, _phase2_grouped_impl

G = int(sys.argv[1]) if len(sys.argv) > 1 else 256
cap_s = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
cap_t = int(sys.argv[3]) if len(sys.argv) > 3 else 64
L = 256
NPOST = 80_000_000
k_full = 16
PACK_BITS = max(int(L).bit_length(), 1)
REPS = 10

rng = np.random.default_rng(5)
postings_d = ((jnp.arange(NPOST, dtype=jnp.uint32) * jnp.uint32(2654435761))
              % jnp.uint32(1_000_000))

# per query: runs with the measured 1M length mix -- 90 short (mean ~18)
# and 16 long (mean ~220), filling ~70% of both caps
offs = np.zeros((G, L), np.int32)
wstart = np.zeros((G, L), np.int32)
run_start = np.zeros((G, L), np.int32)
lens_s_arr = np.zeros((G, L), np.int32)
rows_l_arr = np.zeros((G, L), np.int32)
lens_l_arr = np.zeros((G, L), np.int32)
for g in range(G):
    lane = 0
    s_budget = int(0.72 * cap_s)
    t_budget = int(0.72 * cap_t)
    while lane < L - 4:
        w = int(rng.integers(1, 5))
        w = min(w, L - lane)
        mk_long = rng.random() < 0.15 and t_budget > 2
        off = int(rng.integers(0, NPOST - (1 << 17)))
        offs[g, lane : lane + w] = off
        wstart[g, lane] = w
        run_start[g, lane : lane + w] = lane
        if mk_long:
            ln = int(min(rng.integers(T_SPLIT, 527), 526))
            tr = ((off & 127) + ln + 127) >> 7
            if tr <= t_budget:
                rows_l_arr[g, lane] = tr
                lens_l_arr[g, lane] = ln
                t_budget -= tr
        else:
            ln = int(rng.integers(1, T_SPLIT))
            if ln <= s_budget:
                lens_s_arr[g, lane] = ln
                s_budget -= ln
        lane += w
cum_s = np.cumsum(lens_s_arr, axis=1).astype(np.int32)
cum_t = np.cumsum(rows_l_arr, axis=1).astype(np.int32)

offs_d = jnp.asarray(offs)
cum_s_d = jnp.asarray(cum_s)
w_d = jnp.asarray(wstart)
rs_d = jnp.asarray(run_start)
cum_t_d = jnp.asarray(cum_t)
lens_l_d = jnp.asarray(lens_l_arr)


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


out = {"G": G, "cap_s": cap_s, "cap_t": cap_t, "L": L,
       "short_mean": float(cum_s[:, -1].mean()),
       "tile_rows_mean": float(cum_t[:, -1].mean()),
       "elems_equiv_mean": float((cum_s[:, -1]
                                  + 128 * cum_t[:, -1]).mean())}


def save():
    o = {k: (round(v, 3) if isinstance(v, float) else v)
         for k, v in out.items()}
    with open(os.path.join(
            REPO, ".bench_cache",
            f"hybrid_p2_G{G}_s{cap_s}_t{cap_t}.json"), "w") as f:
        json.dump(o, f, indent=1)
    print(json.dumps(o), flush=True)


for pos in (False, True):
    j = jax.jit(partial(_phase2_grouped_impl, cap_s=cap_s, cap_t=cap_t,
                        k=k_full, positions=pos, pack_w_bits=PACK_BITS))
    key = "full_cold_pos_ms" if pos else "full_cold_ms"
    out[key] = timed(lambda: j(postings_d, offs_d, cum_s_d, w_d, rs_d,
                               cum_t_d, lens_l_d)) * 1e3
    save()

# expansion alone
ex_j = jax.jit(lambda p, o, cs, w, ct, ll: C.expand_hybrid(
    p, o, cs, w, ct, ll, cap_s, cap_t))
out["expand_ms"] = timed(lambda: ex_j(
    postings_d, offs_d, cum_s_d, w_d, cum_t_d, lens_l_d)) * 1e3
save()
