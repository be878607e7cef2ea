"""FASTQ_FLOOR: committed per-read host budget for the fastq pipeline.

The fastq path is HOST-bound on this image's 2 CPU cores (device work
overlaps via the depth-4 dispatch pipeline; BENCH r1-r3 regressions all
traced to host-side Python).  This script measures where each read's host
time goes, two ways:

1. stage timings measured directly (read parse; + ORF scan; the isolated
   native scanner rate), each as a standalone pass over the bench workload;
2. a cProfile of the FULL pipeline (CPU backend) bucketed into phases by
   file/function, with device wait (`Array._value`, jnp dispatch) reported
   separately -- on the real chip that bucket is tunnel/device time that
   the pipelining overlaps, so the HOST budget is the sum of the others.

Writes FASTQ_FLOOR_r04.json at the repo root.
Run: python scripts/fastq_floor.py [n_reads=8192]
"""

import cProfile
import json
import os
import pstats
import sys
import tempfile
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import _AA2CODON, CACHE_ROOT, build_skewed_db, ensure_db
from kaamer_tpu.search.engine import SearchEngine
from kaamer_tpu.search.options import READS, SearchOptions
from kaamer_tpu.search.pipeline import run_search

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192

art = ensure_db(os.path.join(CACHE_ROOT, "skew_10000"), build_skewed_db,
                10_000)
engine = SearchEngine(art)
rng = np.random.default_rng(7)

td = tempfile.mkdtemp()
path = os.path.join(td, "reads.fq")
with open(path, "w") as f:
    for i in range(N):
        row = int(rng.integers(0, art.num_proteins))
        seq = art.sequence(row)
        start = int(rng.integers(0, max(len(seq) - 50, 1)))
        frag = seq[start : start + 50]
        dna = "taa" + "".join(_AA2CODON.get(a, "gct") for a in frag) + "taa"
        f.write(f"@r{i}\n{dna}\n+\n{'I' * len(dna)}\n")

opts = SearchOptions(File=path, SequenceType=READS)
for _ in run_search(engine, opts):  # warm compiles
    pass

out = {"n_reads": N, "db": "skewed 10k", "host": "2 CPU cores"}

# --- stage passes ------------------------------------------------------------
from kaamer_tpu.io_formats.readers import read_fastq_queries

t0 = time.perf_counter()
reads = list(read_fastq_queries(path))
out["read_parse_s"] = round(time.perf_counter() - t0, 3)

from kaamer_tpu.search.orf import get_orf_tuples_batch

t0 = time.perf_counter()
n_orfs = 0
for i in range(0, len(reads), 2048):
    batch = get_orf_tuples_batch(
        [r.Sequence for r in reads[i : i + 2048]], 11, min_kmers=1)
    n_orfs += sum(len(b) for b in batch)
out["orf_scan_s"] = round(time.perf_counter() - t0, 3)
out["n_orfs"] = n_orfs

# --- full pipeline: uninstrumented wall, then under cProfile -----------------
t0 = time.perf_counter()
rows_out = sum(c.count(b"\n") for c in run_search(engine, opts))
wall_plain = time.perf_counter() - t0

t0 = time.perf_counter()
prof = cProfile.Profile()
prof.enable()
n_results = sum(1 for _ in run_search(engine, opts))
prof.disable()
wall = time.perf_counter() - t0
out["n_results"] = n_results
out["result_rows"] = rows_out
out["cpu_backend_wall_s"] = round(wall, 3)
out["cpu_backend_wall_unprofiled_s"] = round(wall_plain, 3)

BUCKETS = {
    "device_wait_or_cpu_compute": ("array.py", "_value", "pjit", "pxla",
                                   "dispatch.py", "profiler.py"),
    "read_parse": ("readers.py",),
    "orf_scan": ("orf.py",),
    "result_build": ("pipeline.py",),
    "format": ("results.py",),
    "engine_host": ("engine.py", "count.py", "hotset.py", "codec.py",
                    "native",),
}

st = pstats.Stats(prof)
phases = {k: 0.0 for k in BUCKETS}
phases["other_python"] = 0.0
total = 0.0
for (fn, line, name), (cc, nc, tt, ct, callers) in st.stats.items():
    total += tt
    for bucket, keys in BUCKETS.items():
        if any(k in fn or k in name for k in keys):
            phases[bucket] += tt
            break
    else:
        phases["other_python"] += tt

host_s = total - phases["device_wait_or_cpu_compute"]
# cProfile adds per-call overhead to every Python bucket; calibrate the
# uninstrumented host cost as (plain wall) - (device compute measured under
# the profiler, which is C-side and barely instrumented)
host_plain = max(wall_plain - phases["device_wait_or_cpu_compute"], 1e-6)
out["profile"] = {
    "total_s": round(total, 3),
    "phases_s": {k: round(v, 3) for k, v in phases.items()},
    "host_python_s": round(host_s, 3),
    "host_us_per_read": round(host_s / N * 1e6, 1),
    "host_bound_reads_per_s": round(N / host_s, 1),
    "host_python_unprofiled_s": round(host_plain, 3),
    "host_bound_reads_per_s_unprofiled": round(N / host_plain, 1),
}
out["read_as"] = (
    "host_python_s excludes device wait (overlapped by the depth-4 "
    "pipeline on the real chip): host_bound_reads_per_s is the fastq "
    "ceiling this host imposes; the driver-captured on-chip figure in "
    "BENCH_rNN approaches it as overlap improves")

p = os.path.join(REPO, "FASTQ_FLOOR_r04.json")
with open(p, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
print("wrote", p, file=sys.stderr)
