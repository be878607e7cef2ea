"""Tile-tier A/B (VERDICT r4 ask 2b): skewed 10k and 100k protein
throughput with the two-tier expansion ON (T_SPLIT=64, production) vs OFF
(T_SPLIT=2^30: every cold run expands element-by-element), same session,
same tunnel window.

Writes TILE_AB_r05.json.  Run: python scripts/tile_ab.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".bench_cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import BATCH, CACHE_ROOT, build_skewed_db, ensure_db, make_queries
from kaamer_tpu.search import engine as em

out = {"t_split_on": em.T_SPLIT, "configs": {}}
for n, nq in ((10_000, 8192), (100_000, 4096)):
    art = ensure_db(os.path.join(CACHE_ROOT, f"skew_{n}"), build_skewed_db, n)
    rng = np.random.default_rng(99)
    queries = make_queries(art, rng, n_queries=nq)
    sizes = [len(q) - 6 for q in queries]

    def batches():
        for i in range(0, nq, BATCH):
            yield queries[i : i + BATCH], sizes[i : i + BATCH]

    for label, ts in (("tiles_on", 64), ("tiles_off", 1 << 30)):
        em.T_SPLIT = ts
        eng = em.SearchEngine(art)

        def full():
            hs = [eng.dispatch_batch(q, s, k=10) for q, s in batches()]
            ss = [eng.schedule_batch(h) for h in hs]
            ss = [eng.prefetch_batch(s) for s in ss]
            for s_ in ss:
                eng.collect_batch(s_)

        full()
        full()
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            full()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out["configs"][f"{n}_{label}"] = round(nq / best, 1)
        print(f"{n} {label}: {out['configs'][f'{n}_{label}']} q/s",
              flush=True)
        del eng
    em.T_SPLIT = 64

out["read_as"] = (
    "if tiles_off beats tiles_on at small scale, the tile tier should be "
    "gated by DB size; the r4 open question was whether T_SPLIT=64 taxes "
    "the 10k headline")
path = os.path.join(REPO, "TILE_AB_r05.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote {path}", file=sys.stderr)
