"""Host-side cProfile of the fastq pipeline (CPU jax; device time is not
representative here -- read the pipeline/orf/results/readers rows only).

Usage: python scripts/profile_fastq_host.py [n_reads]
"""

import cProfile
import os
import pstats
import sys
import tempfile
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import _AA2CODON, build_skewed_db
from kaamer_tpu.index.artifact import load_db
from kaamer_tpu.search.engine import SearchEngine
from kaamer_tpu.search.options import READS, SearchOptions
from kaamer_tpu.search.pipeline import run_search

N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 8192

db = "/tmp/kaamer_prof_fastq_db"
if not os.path.exists(os.path.join(db, "meta.json")):
    build_skewed_db(db, 10_000)
art = load_db(db)
engine = SearchEngine(art)
rng = np.random.default_rng(7)

td = tempfile.mkdtemp()
path = os.path.join(td, "reads.fq")
with open(path, "w") as f:
    for i in range(N_READS):
        row = int(rng.integers(0, art.num_proteins))
        seq = art.sequence(row)
        start = int(rng.integers(0, max(len(seq) - 50, 1)))
        frag = seq[start : start + 50]
        dna = "taa" + "".join(_AA2CODON.get(a, "gct") for a in frag) + "taa"
        f.write(f"@r{i}\n{dna}\n+\n{'I' * len(dna)}\n")

opts = SearchOptions(File=path, SequenceType=READS)
# warm compiles
for _ in run_search(engine, opts):
    pass

t0 = time.perf_counter()
prof = cProfile.Profile()
prof.enable()
n = sum(1 for _ in run_search(engine, opts))
prof.disable()
dt = time.perf_counter() - t0
print(f"reads={N_READS} results={n} wall={dt:.2f}s ({N_READS/dt:.0f} r/s CPU)")
st = pstats.Stats(prof)
st.sort_stats("cumulative").print_stats(
    r"(pipeline|orf|results|readers|records|engine|count|hotset)\.py", 30)
st.sort_stats("tottime").print_stats(30)
