"""Database build: makedb + indexdb fused into a sort-based pipeline.

The reference builds its database by streaming (kmer -> protein_id) inserts
into a multi-version LSM tree (makedb/inputFASTA.go:245-248) and then runs a
second "index" pass that replays every k-mer's versions to build deduplicated
protein-set records (indexdb.go:68-150, kcomb_store.go:42-85).

Here the same result is produced as one vectorized pipeline over flat arrays:

  1. parse proteins, encode each sequence's sliding-window 7-mers
     (codec.encode_kmers) and collect (kmer<<32 | protein_row) uint64 pairs;
  2. radix-sort the pairs (np.sort) and drop duplicates -- duplicates arise
     when a k-mer occurs twice in one protein, exactly the case the
     reference's RemoveDuplicatesFromSlice handles (kv_store.go:284-305);
  3. group by k-mer; deduplicate identical protein sets (the KComb concept)
     by double-64-bit segment hashing;
  4. build the open-addressing kmer -> set_id table (hashtable.build_table).

An unindexed build (-noindex) stops after step 2 and persists the sorted
pairs, which keeps split builds mergeable (mergedb semantics).
"""

from __future__ import annotations

import datetime
import os
from typing import Iterable, List, Optional, Tuple

import json
import numpy as np

from .. import codec
from ..io_formats import PARSERS
from ..records import KSettings, KStats, Protein
from . import artifact
from .hashtable import build_table

KMER_SIZE = 7


def _collect_proteins(
    entries: Iterable[Tuple[int, Protein]],
    progress: bool = False,
):
    """Materialize protein columns + kmer pairs from a parser stream.

    K-mer pair extraction and the global sort run through the native C++
    kernels (kaamer_tpu/native) when the toolchain is available, with a
    numpy fallback."""
    from .. import native

    ids: List[int] = []
    lengths: List[int] = []
    entry_ids: List[bytes] = []
    sequences: List[bytes] = []
    features: List[bytes] = []
    pair_chunks: List[np.ndarray] = []

    # pending chunk of concatenated sequence bytes for batch extraction
    chunk_seqs: List[bytes] = []
    chunk_base = 0
    chunk_bytes = 0

    count_aa = 0
    count_kmers = 0

    def flush_chunk():
        nonlocal chunk_seqs, chunk_base, chunk_bytes
        if not chunk_seqs:
            return
        buf = np.frombuffer(b"".join(chunk_seqs), dtype=np.uint8)
        offs = np.zeros(len(chunk_seqs) + 1, dtype=np.int64)
        np.cumsum([len(s) for s in chunk_seqs], out=offs[1:])
        pair_chunks.append(native.extract_pairs(buf, offs, chunk_base))
        chunk_base += len(chunk_seqs)
        chunk_seqs = []
        chunk_bytes = 0

    for row, (pid, prot) in enumerate(entries):
        ids.append(pid)
        lengths.append(prot.Length)
        entry_ids.append(prot.EntryId.encode("utf-8"))
        seq_b = prot.Sequence.encode("utf-8")
        sequences.append(seq_b)
        features.append(
            json.dumps(prot.Features, separators=(",", ":")).encode("utf-8")
            if prot.Features else b""
        )
        count_aa += prot.Length
        count_kmers += prot.Length - KMER_SIZE + 1

        chunk_seqs.append(seq_b)
        chunk_bytes += len(seq_b)
        if chunk_bytes >= 64_000_000:
            flush_chunk()
        if progress and (row + 1) % 10000 == 0:
            print(f"Processed {row + 1} proteins")

    flush_chunk()

    all_pairs = (
        np.concatenate(pair_chunks) if pair_chunks else np.empty(0, dtype=np.uint64)
    )
    pair_chunks.clear()  # release the pre-concat copies before sorting
    all_pairs = native.sort_u64(all_pairs)

    stats = KStats(
        NumberOfProteins=len(ids),
        NumberOfAA=count_aa,
        NumberOfKmers=count_kmers,
        NumberOfKCombSets=0,
    )
    return (
        np.asarray(ids, dtype=np.uint32),
        np.asarray(lengths, dtype=np.int32),
        entry_ids,
        sequences,
        features,
        all_pairs,
        stats,
    )


def build_db(
    db_path: str,
    input_path: str,
    input_fmt: str = "fasta",
    offset: int = 0,
    length: Optional[int] = None,
    no_index: bool = False,
    progress: bool = False,
) -> None:
    """makedb equivalent (reference makedb.go:33-82)."""
    input_fmt = input_fmt.lower()
    if input_fmt not in PARSERS:
        raise ValueError(f"Input format unrecognized: {input_fmt}")
    parser, default_features = PARSERS[input_fmt]

    kwargs = {"offset": offset}
    if length is not None:
        kwargs["length"] = length

    def stream():
        for item in parser(input_path, **kwargs):
            yield item

    # TSV derives the feature list from its header row (inputTSV.go:98,185-190)
    if input_fmt == "tsv":
        from ..io_formats.readers import open_maybe_gzip

        with open_maybe_gzip(input_path) as f:
            header = f.readline().rstrip("\n").split("\t")
        default_features = [h for h in header if h.lower() not in ("entryid", "sequence")]

    (ids, lengths, entry_ids, sequences, features, pairs, stats) = _collect_proteins(
        stream(), progress=progress
    )
    stats.Features = list(default_features or [])

    db_name = os.path.basename(os.path.normpath(db_path))
    settings = KSettings(
        Name=db_name,
        Port=8321,
        CreationDate=datetime.date.today().isoformat(),
        OriginalFile=os.path.basename(input_path),
        DatabaseIndexed=False,
    )

    artifact.save_db(
        db_path,
        stats=stats,
        settings=settings,
        protein_ids=ids,
        protein_lengths=lengths,
        entry_ids=entry_ids,
        sequences=sequences,
        features=features,
        pairs=pairs,
    )
    # free the build arrays before indexing -- index_db re-reads them memory-
    # mapped, and at 1M proteins this frame otherwise pins ~3 GB through the
    # whole dedup pass
    del ids, lengths, entry_ids, sequences, features, pairs

    if not no_index:
        index_db(db_path, progress=progress)


def dedup_sets(pairs: np.ndarray):
    """Group sorted (kmer<<32|row) pairs by k-mer and deduplicate identical
    protein sets (the KComb construction, kcomb_store.go:42-63, done here as
    vectorized segment hashing instead of per-key xxhash + collision probing).

    Returns (unique_kmers u32[U], set_id_per_kmer u32[U],
             set_offsets u64[S+1], postings u32[P]).
    """
    if pairs.size == 0:
        return (
            np.empty(0, np.uint32),
            np.empty(0, np.uint32),
            np.zeros(1, np.uint64),
            np.empty(0, np.uint32),
        )

    # Drop duplicate (kmer,row) pairs -- same k-mer repeated within a protein.
    # (Memory note: every step below frees its large intermediates as soon as
    # possible; at 1M proteins / 260M pairs the transient working set is the
    # difference between ~12 GB and ~40 GB peak RSS.)
    pairs = pairs[np.concatenate(([True], pairs[1:] != pairs[:-1]))]

    kmers = (pairs >> np.uint64(32)).astype(np.uint32)
    rows = (pairs & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    del pairs
    N = kmers.size

    new_group = np.concatenate(([True], kmers[1:] != kmers[:-1]))
    group_starts = np.flatnonzero(new_group)
    del new_group
    unique_kmers = kmers[group_starts]
    del kmers
    group_lens = np.diff(np.append(group_starts, N))

    # Two independent 64-bit positional segment hashes.  With <=2^32 sets the
    # probability of any 128-bit collision is negligible (<2^-60).  The
    # per-element hash inputs (row, position-in-group) are generated per
    # group chunk, so only ONE full-length uint64 array exists at a time.
    def mix(x: np.ndarray, c1: int, c2: int) -> np.ndarray:
        x = (x ^ (x >> np.uint64(33))) * np.uint64(c1)
        x = (x ^ (x >> np.uint64(29))) * np.uint64(c2)
        return x ^ (x >> np.uint64(32))

    G = group_starts.size
    GCH = 1 << 22
    bounds = np.append(group_starts, N)
    e = np.empty(N, dtype=np.uint64)

    def fill_e(variant: int) -> None:
        for g0 in range(0, G, GCH):
            g1 = min(G, g0 + GCH)
            lo, hi = int(bounds[g0]), int(bounds[g1])
            pos = (
                np.arange(lo, hi, dtype=np.int64)
                - np.repeat(group_starts[g0:g1], group_lens[g0:g1])
            ).astype(np.uint64)
            r64 = rows[lo:hi].astype(np.uint64)
            if variant == 0:
                e[lo:hi] = mix(r64 + (pos << np.uint64(32)),
                               0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53)
            else:
                e[lo:hi] = mix(r64 * np.uint64(0x9E3779B97F4A7C15) + pos,
                               0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9)

    fill_e(0)
    h1 = np.add.reduceat(e, group_starts)
    fill_e(1)
    h2 = np.add.reduceat(e, group_starts)
    del e, bounds
    h1 += group_lens.astype(np.uint64)  # include set length

    # Unique over the 128-bit signature via lexsort (cheaper than np.unique
    # on a structured view, which argsorts void records).  Run boundaries are
    # computed in chunks to avoid full sorted-key copies.
    order = np.lexsort((h2, h1))
    is_new = np.empty(unique_kmers.size, dtype=bool)
    is_new[:1] = True
    CH = 1 << 25
    for c0 in range(1, unique_kmers.size, CH):
        c1 = min(unique_kmers.size, c0 + CH)
        cur = order[c0:c1]
        prv = order[c0 - 1:c1 - 1]
        is_new[c0:c1] = (h1[cur] != h1[prv]) | (h2[cur] != h2[prv])
    del h1, h2
    n_sets = int(is_new.sum())
    set_id_sorted = np.cumsum(is_new, dtype=np.uint32) - np.uint32(1)
    set_id_per_kmer = np.empty(unique_kmers.size, dtype=np.uint32)
    set_id_per_kmer[order] = set_id_sorted
    # lexsort is stable, so run starts carry the lowest original index --
    # the same representative np.unique(return_index=True) would pick
    rep_idx = order[is_new]
    del order, set_id_sorted, is_new

    # CSR for the unique sets, taking each set's representative group.
    rep_starts = group_starts[rep_idx]
    rep_lens = group_lens[rep_idx]
    set_offsets = np.zeros(n_sets + 1, dtype=np.uint64)
    np.cumsum(rep_lens.astype(np.uint64), out=set_offsets[1:])
    total = int(set_offsets[-1])
    postings = np.empty(total, dtype=np.uint32)
    # Vectorized segment copy.
    src = (
        np.repeat(rep_starts.astype(np.int64), rep_lens)
        + (np.arange(total, dtype=np.int64)
           - np.repeat(set_offsets[:-1].astype(np.int64), rep_lens))
    )
    postings[:] = rows[src]

    return unique_kmers, set_id_per_kmer, set_offsets, postings


def index_db(db_path: str, progress: bool = False) -> None:
    """indexdb equivalent (reference indexdb.go:34-66): turn the sorted pair
    representation into the servable hash-table + CSR postings artifact."""
    db = artifact.load_db(db_path, mmap=True)
    if db.indexed:
        raise ValueError(f"{db_path} is already indexed")
    if progress:
        print("# Creating key combination store")

    # pairs stays a read-only memmap: dedup_sets streams it once and frees
    # each intermediate, keeping index memory ~5x under the pair volume
    unique_kmers, set_ids, set_offsets, postings = dedup_sets(db.pairs)
    ht = build_table(unique_kmers, set_ids)

    db.stats.NumberOfKCombSets = int(set_offsets.size - 1)
    db.settings.DatabaseIndexed = True

    entry_ids = [db._entry_ids.get(i) for i in range(db.num_proteins)]
    sequences = [db._sequences.get(i) for i in range(db.num_proteins)]
    features = [db._features.get(i) for i in range(db.num_proteins)]

    artifact.save_db(
        db_path,
        stats=db.stats,
        settings=db.settings,
        protein_ids=np.asarray(db.protein_ids),
        protein_lengths=np.asarray(db.protein_lengths),
        entry_ids=entry_ids,
        sequences=sequences,
        features=features,
        hash_table=ht.table,
        hash_primary_log2=ht.primary_log2,
        hash_secondary_log2=ht.secondary_log2,
        set_offsets=set_offsets,
        postings=postings,
    )
