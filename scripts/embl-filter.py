#!/usr/bin/env python3
"""Extract the entries of a UniProt/EMBL flat file that belong to a taxon.

Capability match for the reference scripts/embl-filter.py: an entry is kept
when the taxon name appears in its OC (taxonomy) lines (terminated by '.' or
';'), and entries flagged as fragments are skipped.

Usage: embl-filter.py TAXON FILE[.gz] > subset.dat
"""

import gzip
import sys


def filter_taxon(taxon: str, path: str, out) -> None:
    opener = gzip.open if path.endswith("gz") else open
    needles = (f" {taxon};", f" {taxon}.")
    entry_lines = []
    keep = False
    skip = False
    with opener(path, "rt") as f:
        for line in f:
            entry_lines.append(line)
            if line.startswith("OC") and any(n in line for n in needles):
                keep = True
            elif line.startswith("DE") and "Flags: Fragment;" in line:
                skip = True
            if line.startswith("//"):
                if keep and not skip:
                    out.writelines(entry_lines)
                entry_lines = []
                keep = False
                skip = False


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    filter_taxon(sys.argv[1], sys.argv[2], sys.stdout)
