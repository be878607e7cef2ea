"""Stage-level device timing of phase-2 at a given (G, cap, L) on SYNTHETIC
inputs (no DB artifact needed -- everything is generated on device), plus an
A/B of the dense-compare expansion (ops/count.gather_postings) against a
prototype two-level windowed expansion over COMPACTED runs.

Why: SCALE_FLOOR_r04 shows phase-2 classes running at 13-18M gathered
rows/s against a 73M rows/s raw-gather wall; the suspect is the [B, L, cap]
dense comparison that maps flat expansion positions to their k-mer run
(~4 VPU passes over L*cap elements per query).  The windowed variant needs
only L*cap/S + (S+1)*cap compares (S=16: ~10x less at L=256).

Usage: python scripts/p2_synth_floor.py [G] [cap] [L]
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
from kaamer_tpu.search.engine import _phase2_grouped_impl, _phase2_hot_impl

G = int(sys.argv[1]) if len(sys.argv) > 1 else 256
cap = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
L = int(sys.argv[3]) if len(sys.argv) > 3 else 256
NPOST = int(os.environ.get("SYNTH_NPOST", 80_000_000))
NPROT = int(os.environ.get("SYNTH_NPROT", 1_000_000))
H = int(os.environ.get("SYNTH_H", 2048))
P_pad = int(os.environ.get("SYNTH_PPAD", 1 << 20))
k_full = 16
PACK_BITS = max(int(L).bit_length(), 1)

rng = np.random.default_rng(5)

# --- synthetic phase-1 outputs ----------------------------------------------
# runs tile the L lanes; postings lengths heavy-tailed, scaled so the mean
# per-query total is ~0.72*cap (the scheduler dispatches chunks near their
# head's cap)
run_pos_len = rng.integers(1, 5, size=(G, L))
offs = np.zeros((G, L), np.int32)
lens_u = np.zeros((G, L), np.int32)
wstart = np.zeros((G, L), np.int32)
run_start = np.zeros((G, L), np.int32)
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
    # trim to stay under cap
    over = plen.sum() - int(0.95 * cap)
    if over > 0:
        order = np.argsort(-plen)
        for i in order:
            cut = min(over, plen[i] - 1)
            plen[i] -= cut
            over -= cut
            if over <= 0:
                break
    for (lane0, w), pl in zip(raw, plen):
        offs[g, lane0 : lane0 + w] = rng.integers(0, NPOST - (1 << 17))
        lens_u[g, lane0] = pl
        wstart[g, lane0] = w
        run_start[g, lane0 : lane0 + w] = lane0
cum = np.cumsum(lens_u, axis=1).astype(np.int32)
whot = np.zeros((G, L), np.int32)  # cold-only timing

offs_d = jnp.asarray(offs)
cum_d = jnp.asarray(cum)
w_d = jnp.asarray(wstart)
rs_d = jnp.asarray(run_start)
wh_d = jnp.asarray(whot)
total_d = cum_d[:, -1]

postings_d = ((jnp.arange(NPOST, dtype=jnp.uint32) * jnp.uint32(2654435761))
              % jnp.uint32(NPROT))

REPS = 10


def _close(o):
    """Wait for a computation by FETCHING a few bytes of its output
    (block_until_ready is unreliable over the tunnel, CLAUDE.md): the
    device queue is in-order, so one tiny device_get of the LAST output
    proves the whole rep loop executed."""
    while isinstance(o, (tuple, list)):
        o = o[0]
    flat = o.reshape(-1)
    return np.asarray(flat[:1])


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


out = {"G": G, "cap": cap, "L": L,
       "rows_mean": float(np.asarray(total_d).mean())}


def _save():
    o = {k: (round(v, 3) if isinstance(v, float) else v)
         for k, v in out.items()}
    with open(os.path.join(REPO, ".bench_cache",
                           f"p2_synth_G{G}_cap{cap}_L{L}.json"), "w") as f:
        json.dump(o, f, indent=1)
    print(json.dumps(o), flush=True)

_orig_setitem = None
class _AutoSave(dict):
    def __setitem__(self, k, v):
        super().__setitem__(k, v)
        if k.endswith("_ms") or k.startswith("v2_"):
            _save()

out = _AutoSave(out)

# --- current production: full cold p2 ---------------------------------------
cold_j = jax.jit(partial(_phase2_grouped_impl, cap=cap, k=min(k_full, cap),
                         positions=False, pack_w_bits=PACK_BITS))
out["full_cold_ms"] = timed(lambda: cold_j(
    postings_d, offs_d, cum_d, w_d, rs_d)) * 1e3

# --- gather_postings (dense-compare expansion + postings gather) ------------
gp_j = jax.jit(lambda p, o, c, t, w: C.gather_postings(
    p, o, c, t, cap, wstart=w))
out["gather_postings_ms"] = timed(
    lambda: gp_j(postings_d, offs_d, cum_d, total_d, w_d)) * 1e3

# --- seg/prev/w dense compare ONLY (no postings gather) ---------------------
def _seg_only(cum, wstart, total):
    B = cum.shape[0]
    chunk = max(512, min(cap, (1 << 24) // max(L, 1)))
    segs, prevs, ws = [], [], []
    for c0 in range(0, cap, chunk):
        c1 = min(cap, c0 + chunk)
        j3 = jnp.arange(c0, c1, dtype=jnp.int32)[None, None, :]
        le = cum[:, :, None] <= j3
        segs.append(le.astype(jnp.int32).sum(axis=1))
        prevs.append(jnp.max(jnp.where(le, cum[:, :, None], 0), axis=1))
        le_prev = jnp.concatenate([jnp.ones_like(le[:, :1]), le[:, :-1]], 1)
        in_seg = le_prev & ~le
        ws.append((in_seg * wstart[:, :, None]).sum(axis=1))
    seg = segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=1)
    prev = prevs[0] if len(prevs) == 1 else jnp.concatenate(prevs, axis=1)
    w = ws[0] if len(ws) == 1 else jnp.concatenate(ws, axis=1)
    return seg, prev, w

seg_j = jax.jit(_seg_only)
out["seg_dense_ms"] = timed(lambda: seg_j(cum_d, w_d, total_d)) * 1e3

# --- postings row gather alone (precomputed src) ----------------------------
rows_ref, seg_ref, valid_ref, wexp_ref = gp_j(postings_d, offs_d, cum_d,
                                              total_d, w_d)
seg_h, prev_h, _ = seg_j(cum_d, w_d, total_d)
src_h = jnp.take_along_axis(offs_d, jnp.minimum(seg_h, L - 1), axis=1) + (
    jnp.arange(cap, dtype=jnp.int32)[None, :] - prev_h)
src_h = jnp.where(jnp.arange(cap)[None, :] < total_d[:, None], src_h, 0)
pg_j = jax.jit(lambda p, s: jnp.take(p, s.reshape(-1)).reshape(G, cap))
out["postings_gather_ms"] = timed(lambda: pg_j(postings_d, src_h)) * 1e3

# --- sort variants ----------------------------------------------------------
pack_j = jax.jit(lambda r, w: jnp.sort(
    jnp.where(r == C.ROW_SENTINEL, jnp.uint32(0xFFFFFFFF),
              (r.astype(jnp.uint32) << jnp.uint32(PACK_BITS))
              | w.astype(jnp.uint32)), axis=1))
out["sort_packed_ms"] = timed(lambda: pack_j(rows_ref, wexp_ref)) * 1e3

# --- count_topk on pregathered rows -----------------------------------------
ct_j = jax.jit(lambda r, w: C.count_topk(r, min(k_full, cap), weights=w,
                                         pack_w_bits=PACK_BITS))
out["count_topk_ms"] = timed(lambda: ct_j(rows_ref, wexp_ref)) * 1e3

# ---------------------------------------------------------------------------
# Prototype: two-level windowed expansion over COMPACTED runs
# ---------------------------------------------------------------------------
S = 16
W = S + 1
BIGCUM = np.int32(2**30)


def compact_runs(offs, cum, wstart):
    """[B, L] per-lane run data -> run-compacted arrays via one 5-operand
    sort (key: run-start lanes keep their lane id, others go to L)."""
    B, L = offs.shape
    lane = jnp.arange(L, dtype=jnp.int32)[None, :]
    lens_u = cum - jnp.concatenate([jnp.zeros((B, 1), jnp.int32),
                                    cum[:, :-1]], axis=1)
    is_run = lens_u > 0
    key = jnp.where(is_run, lane, jnp.int32(L))
    cum_pad = jnp.where(is_run, cum, BIGCUM)
    lane_b = jnp.broadcast_to(lane, (B, L))
    key_s, offs_c, cum_c, w_c, lane_c = jax.lax.sort(
        (key, offs, cum_pad, wstart, lane_b), num_keys=1)
    return offs_c, cum_c, w_c, lane_c


def expand_windowed(postings, offs_c, cum_c, w_c, lane_c, total):
    """rows/seg/valid/w for the [B, cap] expansion grid from compacted runs.

    Level 1: r_b[b, t] = #runs with cum_c <= t*S  (dense [B, L, T] pass).
    Level 2: within block t, compare j against the W=S+1 run cumsums
    starting at r_b (cum_c strictly increasing => at most S boundaries per
    block).  All per-run metadata then arrives via take_along_axis.
    """
    B = offs_c.shape[0]
    T = cap // S
    tb = (jnp.arange(T, dtype=jnp.int32) * S)[None, None, :]
    r_b = (cum_c[:, :, None] <= tb).astype(jnp.int32).sum(axis=1)  # [B, T]
    win = jnp.minimum(r_b[:, :, None] + jnp.arange(W, dtype=jnp.int32),
                      L - 1)                                        # [B, T, W]
    cum_win = jnp.take_along_axis(cum_c, win.reshape(B, -1),
                                  axis=1).reshape(B, T, W)
    j_s = (jnp.arange(S, dtype=jnp.int32)[None, None, :, None]
           + (jnp.arange(T, dtype=jnp.int32) * S)[None, :, None, None])
    cnt = (cum_win[:, :, None, :] <= j_s).astype(jnp.int32).sum(-1)  # [B,T,S]
    r = jnp.minimum((r_b[:, :, None] + cnt).reshape(B, cap), L - 1)
    offs_j = jnp.take_along_axis(offs_c, r, axis=1)
    cum_prev = jnp.concatenate([jnp.zeros((B, 1), jnp.int32),
                                cum_c[:, :-1]], axis=1)
    prev_j = jnp.take_along_axis(cum_prev, r, axis=1)
    w_j = jnp.take_along_axis(w_c, r, axis=1)
    seg_j = jnp.take_along_axis(lane_c, r, axis=1)
    jj = jnp.arange(cap, dtype=jnp.int32)[None, :]
    valid = jj < total[:, None]
    src = jnp.where(valid, offs_j + (jj - prev_j), 0)
    rows = jnp.where(valid,
                     jnp.take(postings, src.reshape(-1)).reshape(B, cap),
                     C.ROW_SENTINEL)
    return rows, seg_j, valid, jnp.where(valid, w_j, 0)


def full_cold_v2(postings, offs, cum, wstart, total):
    offs_c, cum_c, w_c, lane_c = compact_runs(offs, cum, wstart)
    rows, seg, valid, w = expand_windowed(postings, offs_c, cum_c, w_c,
                                          lane_c, total)
    return C.count_topk(rows, min(k_full, cap), weights=w,
                        pack_w_bits=PACK_BITS)

ew_j = jax.jit(full_cold_v2)
out["full_cold_v2_ms"] = timed(lambda: ew_j(
    postings_d, offs_d, cum_d, w_d, total_d)) * 1e3

# correctness: v2 counts == production counts
c_ref, h_ref = jax.jit(lambda p, o, c, w, r: _phase2_grouped_impl(
    p, o, c, w, r, cap=cap, k=min(k_full, cap), positions=False,
    pack_w_bits=PACK_BITS))(postings_d, offs_d, cum_d, w_d, rs_d)
c_v2, h_v2 = ew_j(postings_d, offs_d, cum_d, w_d, total_d)
out["v2_counts_equal"] = bool(np.array_equal(np.asarray(c_ref),
                                             np.asarray(c_v2)))
out["v2_rows_equal"] = bool(np.array_equal(np.asarray(h_ref),
                                           np.asarray(h_v2)))

# compact_runs alone (charged once per batch, not per chunk)
cr_j = jax.jit(compact_runs)
out["compact_runs_ms"] = timed(lambda: cr_j(offs_d, cum_d, w_d)) * 1e3

# expansion only (v2, no sort/topk)
offs_c_d, cum_c_d, w_c_d, lane_c_d = cr_j(offs_d, cum_d, w_d)
exw_j = jax.jit(expand_windowed)
out["expand_windowed_ms"] = timed(lambda: exw_j(
    postings_d, offs_c_d, cum_c_d, w_c_d, lane_c_d, total_d)) * 1e3

# --- hot-path stages (synthetic M) ------------------------------------------
hot_starts_d = jnp.sort(jnp.asarray(
    rng.choice(NPOST, size=H, replace=False).astype(np.int32)))


@jax.jit
def _mk_M():
    return (((jnp.arange(H, dtype=jnp.uint32)[:, None] * 7919
              + jnp.arange(P_pad, dtype=jnp.uint32)[None, :] * 104729)
             & 15) == 0).astype(jnp.bfloat16)


M_d = _mk_M()
MT_d = jax.jit(lambda m: m.T)(M_d)

hw_j = jax.jit(lambda o, w: HS.hot_weights(o, w, hot_starts_d))
out["hotW_ms"] = timed(lambda: hw_j(offs_d, wh_d)) * 1e3
W_d2 = hw_j(offs_d, wh_d)
mm_j = jax.jit(lambda w, m: HS.hot_matmul(w, m, max_w=L))
out["hotMM_ms"] = timed(lambda: mm_j(W_d2, M_d)) * 1e3
counts_hot = mm_j(W_d2, M_d)

tk_j = jax.jit(lambda c: HS.topk_dense(c, k_full))
out["topk_dense_ms"] = timed(lambda: tk_j(counts_hot)) * 1e3

safe = jnp.minimum(rows_ref, np.uint32(P_pad - 1)).astype(jnp.int32)
hac_j = jax.jit(lambda ch, s: jnp.take_along_axis(ch, s, axis=1))
out["hot_at_cold_gather_ms"] = timed(lambda: hac_j(counts_hot, safe)) * 1e3

s_rows_d, cold_counts_d, is_start_d = jax.jit(
    lambda r, w: C.sort_rle(r, w, pack_w_bits=PACK_BITS))(rows_ref, wexp_ref)
mg_j = jax.jit(lambda ch, s, cc, ist: HS.merge_hot_cold(
    ch, s, cc, ist, k_full, pack_w_bits=PACK_BITS))
out["merge_hot_cold_ms"] = timed(
    lambda: mg_j(counts_hot, s_rows_d, cold_counts_d, is_start_d)) * 1e3

hot_j = jax.jit(partial(_phase2_hot_impl, cap=cap, k=k_full, positions=False,
                        pack_w_bits=PACK_BITS))
out["full_hot_ms"] = timed(lambda: hot_j(
    postings_d, M_d, MT_d, hot_starts_d, offs_d, cum_d, w_d, rs_d,
    wh_d)) * 1e3

for k in list(out):
    if k.endswith("_ms"):
        out[k] = round(out[k], 3)
print(json.dumps(out, indent=1))
with open(os.path.join(REPO, ".bench_cache",
                       f"p2_synth_G{G}_cap{cap}_L{L}.json"), "w") as f:
    json.dump(out, f, indent=1)
