"""Does gathering WIDER postings rows beat per-element gathers?

Expansion slices are consecutive in the postings array, so if slice starts
are A-aligned the [G, cap] expansion becomes a [G, cap/A] gather of
(4*A)-byte rows.  PROBE_FLOOR_r03's cost model says HBM row-gathers are
row-count-dominated and width-flat from 4-32B -- which predicts an ~A-fold
speedup.  This measures it: element gather vs A in {2, 4, 8, 16} wide row
gathers at the same total element count, plus the locality question
(sorted vs unsorted src) and the cost of take_along_axis(offs, seg)
(suspected ~40ms/chunk inside gather_postings).

Usage: python scripts/gather_width_probe.py [G] [cap]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.makedirs(os.path.join(REPO, ".bench_cache", "jax"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".bench_cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

G = int(sys.argv[1]) if len(sys.argv) > 1 else 256
cap = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
NPOST = 80_000_000
L = 256

rng = np.random.default_rng(5)
postings_d = ((jnp.arange(NPOST, dtype=jnp.uint32) * jnp.uint32(2654435761))
              % jnp.uint32(1_000_000))

# synthetic src resembling expansion: per query ~80 runs of consecutive
# indices at random (8-aligned) bases
n_runs = 80
bases = rng.integers(0, (NPOST - (1 << 17)) // 16, size=(G, n_runs)) * 16
rl = rng.pareto(1.2, size=(G, n_runs)) + 1
rl = (rl / rl.sum(1, keepdims=True) * cap * 0.95).astype(np.int64)
src = np.zeros((G, cap), np.int64)
for g in range(G):
    j = 0
    for r in range(n_runs):
        ln = min(int(rl[g, r]), cap - j)
        src[g, j : j + ln] = bases[g, r] + np.arange(ln)
        j += ln
    src[g, j:] = 0
src_d = jnp.asarray(src.astype(np.int32))

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


out = {"G": G, "cap": cap, "elements": G * cap}


def save():
    o = {k: (round(v, 3) if isinstance(v, float) else v)
         for k, v in out.items()}
    with open(os.path.join(REPO, ".bench_cache",
                           f"gather_width_G{G}_cap{cap}.json"), "w") as f:
        json.dump(o, f, indent=1)
    print(json.dumps(o), flush=True)


el_j = jax.jit(lambda p, s: jnp.take(p, s.reshape(-1)).reshape(G, cap))
out["element_ms"] = timed(lambda: el_j(postings_d, src_d))*1e3; save()

src_sorted = jnp.sort(src_d, axis=1)
out["element_sorted_ms"] = timed(lambda: el_j(postings_d, src_sorted))*1e3
save()

for A in (2, 4, 8, 16):
    pA = postings_d.reshape(NPOST // A, A)
    capA = cap // A
    # aligned group starts: synthetic bases are 16-aligned, consecutive
    # groups within runs stay aligned
    srcA = jnp.asarray((src[:, ::A] // A).astype(np.int32))
    gA = jax.jit(lambda p, s, A=A, capA=capA: jnp.take(
        p, s.reshape(-1), axis=0).reshape(G, capA, A))
    out[f"wide{A}_ms"] = timed(lambda: gA(pA, srcA))*1e3; save()

# take_along_axis(offs[G, L], seg[G, cap]) -- the src-construction gather
offs_small = jnp.asarray(rng.integers(0, NPOST, size=(G, L)).astype(np.int32))
seg_idx = jnp.asarray(rng.integers(0, L, size=(G, cap)).astype(np.int32))
ta_j = jax.jit(lambda o, s: jnp.take_along_axis(o, s, axis=1))
out["take_along_offs_ms"] = timed(lambda: ta_j(offs_small, seg_idx))*1e3
save()

# one-hot select alternative: sum_l offs[l] * (seg==l) in L-chunks
def onehot_sel(o, s):
    acc = jnp.zeros(s.shape, jnp.int32)
    lane = jnp.arange(L, dtype=jnp.int32)
    eq = s[:, :, None] == lane[None, None, :]
    return (eq * o[:, None, :]).sum(axis=2)

oh_j = jax.jit(onehot_sel)
out["onehot_select_ms"] = timed(lambda: oh_j(offs_small, seg_idx))*1e3
save()
