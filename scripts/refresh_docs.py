"""Rewrite the README/docs performance-table cells from the latest
committed artifacts (BENCH_r*.json throughput keys, MAKEDB_r*.json build
rows) -- the generation counterpart of tests/test_docs_drift.py, so the
tables can never drift from what the artifacts say.

Run: python scripts/refresh_docs.py   (idempotent; prints changed cells)
"""

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest(pattern):
    best, best_n = None, -1
    for p in glob.glob(os.path.join(REPO, pattern)):
        m = re.search(r"_r(\d+)", os.path.basename(p))
        if m and int(m.group(1)) > best_n:
            best, best_n = p, int(m.group(1))
    return best


bench_path = latest("BENCH_r*.json")
makedb_path = latest("MAKEDB_r*.json")
with open(bench_path) as f:
    extra = json.load(f)["parsed"]["extra"]
with open(makedb_path) as f:
    builds = json.load(f)["builds"]


def fmt_int(v):
    return f"{int(round(v, -2)):,}"


def fmt_build(s):
    return f"{s:.1f} s" if s < 100 else f"{s / 60:.1f} min"


sk = extra["skewed_db"]
subs = [
    # (row-label substring, regex of the value piece to replace, new value)
    ("skewed 10k", r"~[\d,]+", "~" + fmt_int(sk["10000"]["qps"])),
    ("skewed 10k", r"~[\d.]+M k-mer",
     f"~{sk['10000']['kmer_lookups_per_s'] / 1e6:.0f}M k-mer"),
    ("with position bitmaps", r"~[\d,]+",
     "~" + fmt_int(sk["10000"]["qps_positions"])),
    ("skewed 100k", r"~[\d,]+", "~" + fmt_int(sk["100000"]["qps"])),
    ("skewed 1M", r"~[\d,]+", "~" + fmt_int(sk["1000000"]["qps"])),
    ("*random* 10k", r"~[\d,]+", "~" + fmt_int(extra["random_db_qps_10k"])),
    ("fastq", r"~[\d,]+", "~" + fmt_int(extra["fastq_reads_per_s"])),
    ("`-aln`", r"~[\d,]+ queries/s",
     f"~{extra['aln_queries_per_s']:,.0f} queries/s"),
    ("`-aln`", r"~[\d,]+ (?:aligned )?pairs/s",
     lambda m: f"~{extra['aligned_pairs_per_s']:,.0f} "
               + ("aligned pairs/s" if "aligned" in m.group(0) else "pairs/s")),
    ("makedb 10k proteins", r"[\d.]+ (?:s|min)",
     fmt_build(builds["10000"]["wall_s"])),
    ("makedb 100k proteins", r"[\d.]+ (?:s|min)",
     fmt_build(builds["100000"]["wall_s"])),
    ("makedb 100k proteins", r"[\d.]+ GB",
     f"{builds['100000']['db_gb']:.2f} GB"),
    ("makedb 1M proteins", r"[\d.]+ (?:s|min)",
     fmt_build(builds["1000000"]["wall_s"])),
    ("makedb 1M proteins", r"[\d.]+ GB",
     f"{builds['1000000']['db_gb']:.2f} GB"),
    ("makedb 10k / 100k / 1M", r"[\d.]+ s / [\d.]+ s / [\d.]+ min",
     f"{builds['10000']['wall_s']:.1f} s / {builds['100000']['wall_s']:.0f} s"
     f" / {builds['1000000']['wall_s'] / 60:.1f} min"),
    ("database size at 1M", r"[\d.]+ GB",
     f"{builds['1000000']['db_gb']:.2f} GB"),
    # artifact names in the surrounding prose
    ("", r"BENCH_r\d+\.json", os.path.basename(bench_path)),
    ("", r"MAKEDB_r\d+\.json", os.path.basename(makedb_path)),
]

for doc in ("README.md", "docs/performance.md"):
    path = os.path.join(REPO, doc)
    lines = open(path).read().split("\n")
    changed = 0
    for i, line in enumerate(lines):
        for label, pat, new in subs:
            # re-read the CURRENT line state: several subs can hit one row
            # (qps + k-mer cells, queries/s + pairs/s), and deriving cells
            # from the stale loop variable made the last sub revert the
            # earlier ones
            line = lines[i]
            if label and not (line.startswith("|") and label in line):
                continue
            if not label and "BENCH_r" not in line and "MAKEDB_r" not in line:
                continue
            # only the kaamer-tpu cell (2nd column) for table rows
            if label and line.startswith("|"):
                cells = line.split("|")
                if len(cells) < 3:
                    continue
                new_cell, n = re.subn(pat, new, cells[2], count=1)
                if n:
                    cells[2] = new_cell
                    lines[i] = "|".join(cells)
                    changed += n
            else:
                lines[i], n = re.subn(pat, new, line)
                changed += n
    open(path, "w").write("\n".join(lines))
    print(f"{doc}: {changed} cell(s) updated from "
          f"{os.path.basename(bench_path)} / {os.path.basename(makedb_path)}")
print("now run: python -m pytest tests/test_docs_drift.py -q", file=sys.stderr)
