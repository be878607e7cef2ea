"""Merge unindexed databases (reference pkg/mergedb/mergedb.go:42-135).

The reference merges N unindexed Badger stores by streaming every key of each
DB into the first (mergedb.go:76-116) and summing KStats (91-93).  Here the
unindexed representation is already a sorted (kmer<<32|row) pair array per
DB, so a merge is: concatenate protein columns, re-base each DB's dense rows,
concatenate + re-sort the pair arrays, and sum the stats.

As in the reference, external protein ids are taken as-is: split builds are
expected to use -offset/-length so their id ranges do not collide
(docs/database.md:78-101).  Colliding external ids are reported as an error
here rather than silently overwriting records (the reference's behavior under
collision is last-write-wins in the LSM tree).
"""

from __future__ import annotations

import glob
import os
from typing import List

import numpy as np

from ..records import KSettings, KStats
from . import artifact


def merge_dbs(dbs_path: str, out_path: str, progress: bool = False) -> None:
    paths = sorted(p for p in glob.glob(os.path.join(dbs_path, "*"))
                   if os.path.isdir(p))
    if not paths:
        raise ValueError(f"no databases found under {dbs_path}")

    ids_all: List[np.ndarray] = []
    lengths_all: List[np.ndarray] = []
    entry_ids: List[bytes] = []
    sequences: List[bytes] = []
    features: List[bytes] = []
    pair_arrays: List[np.ndarray] = []
    stats = KStats()
    settings = None

    row_base = 0
    for p in paths:
        if progress:
            print(f"# Merging database {p} into {out_path}...")
        db = artifact.load_db(p, mmap=False)
        if db.indexed:
            raise ValueError(
                f"{p} is indexed; merge requires unindexed (-noindex) builds"
            )
        if settings is None:
            settings = db.settings
            stats.Features = list(db.stats.Features)
        stats.NumberOfProteins += db.stats.NumberOfProteins
        stats.NumberOfAA += db.stats.NumberOfAA
        stats.NumberOfKmers += db.stats.NumberOfKmers

        ids_all.append(np.asarray(db.protein_ids))
        lengths_all.append(np.asarray(db.protein_lengths))
        for i in range(db.num_proteins):
            entry_ids.append(db._entry_ids.get(i))
            sequences.append(db._sequences.get(i))
            features.append(db._features.get(i))

        pairs = np.asarray(db.pairs)
        rebased = (pairs & ~np.uint64(0xFFFFFFFF)) | (
            (pairs & np.uint64(0xFFFFFFFF)) + np.uint64(row_base)
        )
        pair_arrays.append(rebased)
        row_base += db.num_proteins

    ids = np.concatenate(ids_all) if ids_all else np.empty(0, np.uint32)
    if len(np.unique(ids)) != len(ids):
        raise ValueError(
            "duplicate external protein ids across merged databases; "
            "build the parts with distinct -offset ranges"
        )

    merged_pairs = np.sort(np.concatenate(pair_arrays))

    settings = settings or KSettings()
    settings.DatabaseIndexed = False

    artifact.save_db(
        out_path,
        stats=stats,
        settings=settings,
        protein_ids=ids,
        protein_lengths=np.concatenate(lengths_all),
        entry_ids=entry_ids,
        sequences=sequences,
        features=features,
        pairs=merged_pairs,
    )
