"""Per-stage device timing on the SKEWED bench DB at the real serving shapes.

Reports where a 2048-query batch's device time goes when postings are
power-law (the regime that sets the headline bench number): phase-1 probe,
then each phase-2 group at the cap the scheduler actually picked, and a
breakdown of phase 2 (seg compute / postings gather / sort+RLE / top_k) at
the dominant caps.

Timing discipline (CLAUDE.md): every figure is an amortized loop of REPS
full executions inside one measurement window, closed by a device_get of a
small output; single-pass timings over the tunneled chip are unreliable.
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_skewed_db, ensure_db, make_queries, BATCH
from kaamer_tpu import codec, native
from kaamer_tpu.search.engine import (
    KMER_SIZE, SearchEngine, _next_pow2, _phase2_grouped_impl,
)
from kaamer_tpu.ops.count import count_topk, gather_postings

REPS = 10

db_path = "/tmp/kaamer_bench_skew_10000"
art = ensure_db(db_path, build_skewed_db, 10_000)
engine = SearchEngine(art)
rng = np.random.default_rng(99)
queries = make_queries(art, rng, n_queries=BATCH)
sizes = [len(q) - 6 for q in queries]

B = BATCH
L = _next_pow2(max(max(sizes), 8))
width = L + KMER_SIZE - 1
wire = native.pack_queries(queries, width)
if wire is None:
    wire = codec.pack_codes7(codec.pad_codes_batch(queries, width))
wire_dev = jnp.asarray(wire)
n_dev = jnp.asarray(np.asarray(sizes, dtype=np.int32))


def timed(name, fn, *args, n=REPS):
    """Amortized full-cycle timing: dispatch n times, then fetch a scalar."""
    outs = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(outs)[0].ravel()[0])  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        outs = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(outs)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:42s} {dt*1e3:8.2f} ms", flush=True)
    return fn(*args), dt


# ---- phase 1 at the serving shape --------------------------------------
outs1, t_p1 = timed(
    f"phase1 probe+dedup [B={B}, width={width}]",
    lambda: engine._p1(engine.table, wire_dev, n_dev, width=width))
offs, cum, wstart, run_start, whot, totals, hot_sums = outs1
totals_h = np.asarray(totals)
print(f"totals: p50={np.percentile(totals_h,50):.0f} "
      f"p90={np.percentile(totals_h,90):.0f} "
      f"p99={np.percentile(totals_h,99):.0f} max={totals_h.max()}", flush=True)

# ---- replicate the group schedule ---------------------------------------
from kaamer_tpu.search.engine import _cap_bucket, _cap_floor, MAX_EXPANSION_ELEMS

G = engine.GROUP_B
limit_g = _cap_floor(MAX_EXPANSION_ELEMS // G)
order = sorted(range(B), key=lambda i: -int(totals_h[i]))
groups = []
for c0 in range(0, B, G):
    rows = order[c0 : c0 + G]
    cap_c = min(_cap_bucket(max(int(totals_h[i]) for i in rows)), limit_g)
    groups.append((rows, cap_c))
print("group caps:", [c for _, c in groups], flush=True)

k_full = 32
t_p2 = 0.0
for gi, (rows, cap) in enumerate(groups):
    idx = np.asarray(rows, dtype=np.int32)
    sel = engine._sel(offs, cum, wstart, run_start, whot, jnp.asarray(idx))
    _, dt = timed(
        f"  phase2 group{gi} [G={G}, cap={cap}]",
        lambda sel=sel, cap=cap: engine._p2(engine.postings, *sel[:4], cap=cap,
                                            k=k_full, positions=False))
    t_p2 += dt

print(f"TOTAL p1 + p2: {(t_p1 + t_p2)*1e3:.2f} ms "
      f"-> {B / (t_p1 + t_p2):,.0f} q/s device ceiling", flush=True)

# ---- phase-2 internals at the dominant cap ------------------------------
rows0, cap0 = groups[0]
idx = np.asarray(rows0, dtype=np.int32)
sel = engine._sel(offs, cum, wstart, run_start, whot, jnp.asarray(idx))
offs_g, cum_g, w_g, rs_g, wh_g = sel
total_g = cum_g[:, -1]

gp = jax.jit(partial(gather_postings, cap=cap0))
(rows_g, seg_g, valid_g, wexp_g), _ = timed(
    f"  gather_postings [G={G}, cap={cap0}]",
    lambda: gp(engine.postings, offs_g, cum_g, total_g, wstart=w_g))

ct = jax.jit(partial(count_topk, k=k_full))
timed(f"  count_topk (sort+RLE) [G={G}, cap={cap0}]",
      lambda: ct(rows_g, weights=wexp_g))

srt = jax.jit(lambda r: jnp.sort(r, axis=1))
timed(f"    jnp.sort only [G={G}, cap={cap0}]", lambda: srt(rows_g))

# seg compute alone (the [G, L, cap] dense comparison)
def seg_only(cum, cap):
    j3 = jnp.arange(cap, dtype=jnp.int32)[None, None, :]
    le = cum[:, :, None] <= j3
    return le.astype(jnp.int32).sum(axis=1)

so = jax.jit(partial(seg_only, cap=cap0))
timed(f"    seg compute only [G={G}, L={L}, cap={cap0}]",
      lambda: so(cum_g))
