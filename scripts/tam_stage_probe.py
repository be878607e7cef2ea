"""Stage decomposition of the CURRENT phase-2 kernels on real chunk
inputs (r5, post-TAM): where do the 40 ms hot chunks and 56 ms heavy cold
chunks actually go?

Captures the scheduler's plan on the skewed-1M bench batch, picks one
representative chunk per class of interest, and times jitted sub-kernels
on the chunk's REAL selected inputs:

  expand      expand_hybrid only (seg-map compares + gathers)
  sortrle     expand + sort_rle (the RLE sort)
  topk        expand + sort_rle + count_topk tail (cold kernel complete)
  hotW        hot_weights one-hot einsum
  hotMM       hot_matmul (M stream + slab write)
  hotTK       topk_dense over counts_hot
  tam         full TAM merge kernel (_p2h)

Writes TAM_STAGES_r05.json.  Run: python scripts/tam_stage_probe.py
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
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".bench_cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import BATCH, CACHE_ROOT, build_skewed_db, ensure_db, make_queries
from kaamer_tpu.ops import hotset as HS
from kaamer_tpu.ops.count import count_topk, expand_hybrid, sort_rle
from kaamer_tpu.ops.hotset import CAND_K
from kaamer_tpu.search.engine import SearchEngine

art = ensure_db(os.path.join(CACHE_ROOT, "skew_1000000"), build_skewed_db,
                1_000_000)
engine = SearchEngine(art)
rng = np.random.default_rng(99)
queries = make_queries(art, rng, n_queries=BATCH)
sizes = [len(q) - 6 for q in queries]

plan = []
orig = SearchEngine._dispatch_group


def rec(self, outs1, rows, G, cap_s, cap_t, k_full, L, positions, hot=False,
        identity=False, legacy=False):
    plan.append((outs1, list(rows), G, cap_s, cap_t, k_full, L, hot,
                 identity))
    return orig(self, outs1, rows, G, cap_s, cap_t, k_full, L, positions,
                hot, identity=identity, legacy=legacy)


engine._dispatch_group = rec.__get__(engine)
sched = engine.schedule_batch(engine.dispatch_batch(queries, sizes, k=10))
engine._dispatch_group = orig.__get__(engine)
engine.collect_batch(sched)

# largest-lane chunk per (hot, cap-decade) class
best = {}
for p in plan:
    _, rows, G, cap_s, cap_t, k_full, L, hot, identity = p
    cap_e = cap_s + 128 * cap_t
    key = (hot, 1 << max(10, (cap_e - 1).bit_length()))
    if key not in best or G * cap_e > best[key][2] * (
            best[key][3] + 128 * best[key][4]):
        best[key] = p

REPS = 6


def timed(fn):
    fn()
    t0 = time.perf_counter()
    objs = [fn() for _ in range(REPS)]
    jax.device_get([np.asarray(o).ravel()[0] for o in objs])
    return (time.perf_counter() - t0) / REPS


out = {"classes": {}}
for (hot, decade), (outs1, rows, G, cap_s, cap_t, k_full, L, _h, identity) \
        in sorted(best.items()):
    idx = np.zeros(G, dtype=np.int32)
    idx[: len(rows)] = rows
    sel = engine._sel(tuple(outs1[:7]), jnp.asarray(idx))
    offs, cum_s, wstart, run_start, whot, cum_t, lens_l = [
        jax.device_put(x) for x in sel]
    pw = engine._pack_w_bits(L)
    cap_e = cap_s + 128 * cap_t
    r = {"G": G, "cap_s": cap_s, "cap_t": cap_t,
         "lanes_m": round(G * cap_e / 1e6, 2)}

    # every big array is an explicit jit ARG (closure constants get
    # embedded in the compile payload and the remote service 413s)
    ex_j = jax.jit(partial(expand_hybrid, cap_s=cap_s, cap_t=cap_t))

    @jax.jit
    def expand_only(postings, offs, cum_s, wstart, cum_t, lens_l):
        return ex_j(postings, offs, cum_s, wstart, cum_t, lens_l)[0][:, :1]

    r["expand_ms"] = round(timed(lambda: expand_only(
        engine.postings, offs, cum_s, wstart, cum_t, lens_l)) * 1e3, 2)

    @jax.jit
    def exp_sort(postings, offs, cum_s, wstart, cum_t, lens_l):
        rows_e, seg, valid, w = ex_j(postings, offs, cum_s, wstart, cum_t,
                                     lens_l)
        return sort_rle(rows_e, weights=w, pack_w_bits=pw)[0][:, :1]

    r["expand_sortrle_ms"] = round(timed(lambda: exp_sort(
        engine.postings, offs, cum_s, wstart, cum_t, lens_l)) * 1e3, 2)

    if not hot:
        k2 = min(k_full, cap_e)

        @jax.jit
        def cold_full(postings, offs, cum_s, wstart, cum_t, lens_l):
            rows_e, seg, valid, w = ex_j(postings, offs, cum_s, wstart,
                                         cum_t, lens_l)
            return count_topk(rows_e, k2, weights=w, pack_w_bits=pw)[0]

        r["cold_full_ms"] = round(timed(lambda: cold_full(
            engine.postings, offs, cum_s, wstart, cum_t, lens_l)) * 1e3, 2)
    else:
        hw_j = jax.jit(
            lambda offs, whot, hs: HS.hot_weights(offs, whot, hs)[:, :1])
        r["hotW_ms"] = round(timed(lambda: hw_j(
            offs, whot, engine.hot_starts)) * 1e3, 2)

        @jax.jit
        def mm(offs, whot, hs, M):
            return HS.hot_matmul(HS.hot_weights(offs, whot, hs), M,
                                 max_w=L)[:, :1]

        r["hotW_MM_ms"] = round(timed(lambda: mm(
            offs, whot, engine.hot_starts, engine.M)) * 1e3, 2)

        @jax.jit
        def mmtk(offs, whot, hs, M):
            return HS.topk_dense(
                HS.hot_matmul(HS.hot_weights(offs, whot, hs), M, max_w=L),
                max(CAND_K, k_full))[0]

        r["hotW_MM_TK_ms"] = round(timed(lambda: mmtk(
            offs, whot, engine.hot_starts, engine.M)) * 1e3, 2)

        def full():
            return engine._p2h(
                engine.postings, engine.M, engine.MT, engine.hot_starts,
                offs, cum_s, wstart, run_start, whot, cum_t, lens_l,
                cap_s=cap_s, cap_t=cap_t, k=k_full, positions=False,
                pack_w_bits=pw, k_cold=engine._k_cold)[0]

        r["tam_full_ms"] = round(timed(full) * 1e3, 2)
    out["classes"][f"{'hot' if hot else 'cold'} cap<={decade}"] = r
    print(json.dumps({f"{'hot' if hot else 'cold'} cap<={decade}": r}),
          flush=True)

path = os.path.join(REPO, "TAM_STAGES_r05.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote {path}", file=sys.stderr)
