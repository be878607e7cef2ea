"""What-if sweep over the hot-set LENGTH THRESHOLD on the skewed bench
workload (CPU; no device time needed).

For each candidate threshold T, re-split every bench query's postings runs
into hot (len >= T, served by the dense matmul path) and cold (two-tier
expansion: elements below T_SPLIT, 512 B tile rows above), then price the
batch with the post-TAM cost model:

  cost = sort_lanes * 1.2 ns                (VPU sort/RLE over cap_e lanes)
       + gather_rows / 42 M/s               (element + tile row gathers)
       + hot_lanes * (2*H*P/MXU + 8P/HBM)   (dense flops + counts_hot slab)
       + hot_chunks * 2*H*P/HBM             (membership stream)
       + dispatches * 2.75 ms

This sweep (r5) chose the h_max=1024 budget applied when P > 2^18 in
engine.__init__; the r4 predecessor (element-volume based, pre-tile) chose
H=2048.  Chunk padding is approximated at the measured 1.6x.

Run: python scripts/sweep_hot_h.py [n_proteins=1000000] [n_queries=2048]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from bench import CACHE_ROOT, build_skewed_db, ensure_db, make_queries
from kaamer_tpu.search.engine import T_SPLIT, SearchEngine

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

art = ensure_db(os.path.join(CACHE_ROOT, f"skew_{N}"), build_skewed_db, N)
engine = SearchEngine(art, hot=False)  # phase 1 reports every run as cold
rng = np.random.default_rng(99)
queries = make_queries(art, rng, n_queries=NQ)
sizes = [len(q) - 6 for q in queries]

h = engine.dispatch_batch(queries, sizes, k=10)
offs = np.asarray(h[0][0])[:NQ].astype(np.int64)
starts = engine.set_starts_np.astype(np.int64)
ids = np.searchsorted(starts, offs, side="left")
lens = starts[np.minimum(ids + 1, starts.size - 1)] - starts[ids]
is_new = np.ones_like(offs, bool)
is_new[:, 1:] = offs[:, 1:] != offs[:, :-1]
run_o, run_l = offs[is_new], lens[is_new]
qid = np.broadcast_to(np.arange(NQ)[:, None], offs.shape)[is_new]
real = run_l > 0
run_o, run_l, qid = run_o[real], run_l[real], qid[real]
tile_rows = ((run_o & 127) + run_l + 127) >> 7
set_lens = np.diff(starts[:-1])
P_pad = -(-N // 128) * 128

MXU, HBM, SORT_NS, GATH, PAD = 1e14, 8.1e11, 1.2e-9, 42e6, 1.6
for T in (128, 256, 512, 1024, 2048, 4096, 8192, 16384, 1 << 30):
    hot = run_l >= T
    cold_eff = np.where(run_l < T_SPLIT, run_l,
                        np.where(hot, 0, 128 * tile_rows))
    gath_rows = np.where(run_l < T_SPLIT, run_l,
                         np.where(hot, 0, tile_rows))
    n_hot_q = len(set(qid[hot].tolist()))
    H = int((set_lens >= T).sum())
    dense_per_lane = 2 * H * P_pad / MXU + 8 * P_pad / HBM
    n_chunks_hot = max(1, n_hot_q // 192)
    cost = (cold_eff.sum() * PAD * SORT_NS + gath_rows.sum() * PAD / GATH
            + n_hot_q * 1.3 * dense_per_lane
            + n_chunks_hot * (2 * H * P_pad / HBM)
            + 40 * 2.75e-3)
    print(f"T={T:>8} H={H:>6} hotq={n_hot_q:>5} "
          f"cold_eff={cold_eff.sum() / 1e6:7.1f}M "
          f"gath={gath_rows.sum() / 1e6:6.2f}M "
          f"M_gb={2 * H * P_pad / 2**30:5.2f} "
          f"est={cost * 1e3:6.0f}ms qps~{NQ / (cost + 0.05):6.0f}")
