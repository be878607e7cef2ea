"""Committed makedb evidence: fresh (uncached) skewed-DB builds with
wall-clock, MaxRSS and artifact size -- the numbers docs/performance.md's
makedb rows cite, comparable to the reference's docs/installation.md
resource tables.  Host-only (the build pipeline never touches the chip).

Writes MAKEDB_r04.json at the repo root.
Run: python scripts/makedb_evidence.py [sizes_csv]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from bench import build_skewed_db
from kaamer_tpu.bench.harness import MemoryMonitor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sizes = [int(s) for s in
         (sys.argv[1] if len(sys.argv) > 1 else "10000,100000,1000000"
          ).split(",")]


def du(path):
    total = 0
    for root, _, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


out = {"what": ("fresh skewed-DB builds (build_db: parse + k-mer pair "
                "extraction + out-of-core sort + index_db), host-only; "
                "MaxRSS via interval sampler"),
       "host": "2 CPU cores", "builds": {}}
# partial runs (a sizes_csv argument) refresh only those entries
prev = os.path.join(REPO, "MAKEDB_r04.json")
if os.path.exists(prev):
    with open(prev) as f:
        out["builds"].update(json.load(f).get("builds", {}))
for n in sizes:
    with tempfile.TemporaryDirectory() as td:
        db = os.path.join(td, "db")
        mon_path = os.path.join(td, "monitor.out")
        t0 = time.perf_counter()
        with MemoryMonitor(mon_path, interval=0.5) as mon:
            build_skewed_db(db, n)
        dt = time.perf_counter() - t0
        out["builds"][str(n)] = {
            "wall_s": round(dt, 1),
            "max_rss_gb": round(mon.max_rss / 2**30, 2),
            "db_bytes": du(db),
            "db_gb": round(du(db) / 2**30, 2),
        }
        print(n, out["builds"][str(n)], flush=True)

path = os.path.join(REPO, "MAKEDB_r04.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print("wrote", path)
