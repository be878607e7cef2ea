"""Cost of gathering FULL-TILE rows ([P/128, 128] uint32, 512B real) vs
per-element gathers from the flat postings array.

TPU arrays tile T(8,128): a [R, 2] reshape pads its minor dim to 128 (the
gather_width_probe OOM proved it, 64x bloat), so the only bloat-free wide
row is the native 128-lane tile.  If a tile-row gather costs the same
~25ns a single-element gather does, expanding a postings RUN costs
ceil(len/128)+1 gathers instead of len -- the lever for the 1M-scale
expansion wall (110ms per 4.2M-element chunk, gather_width_probe).

Measures, at several row counts: element gathers, tile-row gathers, and
pair-of-tile-rows gathers (unaligned 128-element windows).

Usage: python scripts/tile_gather_probe.py
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

NPOST = 80_000_000  # 320 MB flat
rng = np.random.default_rng(5)
postings_d = ((jnp.arange(NPOST, dtype=jnp.uint32) * jnp.uint32(2654435761))
              % jnp.uint32(1_000_000))
ptiles_d = postings_d.reshape(NPOST // 128, 128)

REPS = 10


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


out = {}


def save():
    o = {k: (round(v, 4) if isinstance(v, float) else v)
         for k, v in out.items()}
    with open(os.path.join(REPO, ".bench_cache", "tile_gather.json"),
              "w") as f:
        json.dump(o, f, indent=1)
    print(json.dumps(o), flush=True)


for n in (32_768, 262_144, 1_048_576, 4_194_304):
    idx_el = jnp.asarray(rng.integers(0, NPOST, size=n).astype(np.int32))
    el_j = jax.jit(lambda p, s, n=n: jnp.take(p, s))
    ms = timed(lambda: el_j(postings_d, idx_el)) * 1e3
    out[f"element_n{n}_ms"] = ms
    out[f"element_n{n}_ns_per"] = ms * 1e6 / n
    save()

for n in (32_768, 262_144, 1_048_576):
    idx_t = jnp.asarray(
        rng.integers(0, NPOST // 128, size=n).astype(np.int32))
    t_j = jax.jit(lambda p, s, n=n: jnp.take(p, s, axis=0))
    ms = timed(lambda: t_j(ptiles_d, idx_t)) * 1e3
    out[f"tile_n{n}_ms"] = ms
    out[f"tile_n{n}_ns_per"] = ms * 1e6 / n
    save()

# unaligned 128-window: gather rows r and r+1, select with static shifts is
# downstream VPU work; here just the 2-row gather cost
n = 262_144
idx_p = jnp.asarray(
    rng.integers(0, NPOST // 128 - 1, size=n).astype(np.int32))
pair_j = jax.jit(
    lambda p, s: jnp.take(p, jnp.stack([s, s + 1], 1).reshape(-1), axis=0))
ms = timed(lambda: pair_j(ptiles_d, idx_p)) * 1e3
out["pair_n262144_ms"] = ms
out["pair_n262144_ns_per_window"] = ms * 1e6 / n
save()

# the VPU select that turns [n, 2, 128] windows + offsets into [n, 128]
win_d = pair_j(ptiles_d, idx_p).reshape(n, 256)
offs_d = jnp.asarray(rng.integers(0, 128, size=n).astype(np.int32))


def shift_select(w, o):
    acc = jnp.zeros((n, 128), jnp.uint32)
    # o in [0, 128): out[:, i] = w[:, o + i]; 128-way static select is too
    # wide -- use 7 conditional power-of-two rolls (barrel shifter)
    cur = w
    for b in range(7):
        shifted = jnp.roll(cur, -(1 << b), axis=1)
        cur = jnp.where((o[:, None] & (1 << b)) != 0, shifted, cur)
    return cur[:, :128]


ss_j = jax.jit(shift_select)
ms = timed(lambda: ss_j(win_d, offs_d)) * 1e3
out["shift_select_n262144_ms"] = ms
save()
