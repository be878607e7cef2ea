#!/usr/bin/env python3
"""Extract the entries of a GenBank flat file that belong to a taxon.

Capability match for the reference scripts/gbk-filter.py: an entry is kept
when the taxon name appears in its ORGANISM taxonomy block, and entries whose
DEFINITION marks them ", partial" are skipped.

Usage: gbk-filter.py TAXON FILE[.gz] > subset.gbk
"""

import gzip
import sys


def filter_taxon(taxon: str, path: str, out) -> None:
    opener = gzip.open if path.endswith("gz") else open
    needles = (f" {taxon};", f" {taxon}.")
    entry_lines = []
    keep = False
    skip = False
    inside_organism = False
    with opener(path, "rt") as f:
        for line in f:
            entry_lines.append(line)
            stripped = line.strip()
            first = stripped.split(" ")[0] if stripped else ""
            if first == "ORGANISM":
                inside_organism = True
            elif first and not line.startswith(" " * 12):
                inside_organism = False
            if inside_organism and any(n in line for n in needles):
                keep = True
            if line.startswith("DEFINITION") and ", partial" in line:
                skip = True
            if line.startswith("//"):
                if keep and not skip:
                    out.writelines(entry_lines)
                entry_lines = []
                keep = False
                skip = False
                inside_organism = False


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    filter_taxon(sys.argv[1], sys.argv[2], sys.stdout)
