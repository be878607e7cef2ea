"""Bucketed two-level k-mer hash table.

Replaces the reference's Badger LSM point lookups (kv_store.go:157-204) with
an immutable structure designed for batched TPU probes.  Design driver: on
TPU, a *fixed small number* of dense row-gathers beats any data-dependent
probe loop (while-loops pay per-iteration launch overhead; linear-probe
clusters at any practical load factor keep worst-case probes ~18 deep).

Layout (all slots are uint64 = key<<32 | value; key 0xFFFFFFFF = empty):

  primary:    2^p buckets x W slots     bucket = top p bits of k*C1
  secondary:  2^s buckets x W slots     bucket = top s bits of k*C2

Keys land in their primary bucket (W=8 slots, ~4 expected occupants at load
0.5); the ~2% that overflow go to the secondary table, which is sized so it
practically never overflows (it is grown and rebuilt if it does).  Lookup is
exactly TWO gathers of [M, W] rows + vectorized compares -- deterministic,
loop-free, and independent of load factor tail behavior.

The table is stored as one flat uint64 array: primary buckets first, then
secondary; consumers view it as uint32[(2^p+2^s)*W, 2].
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

HASH_MULT = np.uint32(0x9E3779B1)     # primary: Fibonacci multiplier
HASH_MULT2 = np.uint32(0x85EBCA77)    # secondary: xxhash-style odd constant
BUCKET_W = 8

EMPTY_KEY = np.uint32(0xFFFFFFFF)
EMPTY_SLOT = np.uint64(0xFFFFFFFF) << np.uint64(32)  # key=EMPTY, val=0


@dataclass
class KmerHashTable:
    table: np.ndarray  # uint64[(2^p + 2^s) * W]
    primary_log2: int  # p
    secondary_log2: int  # s

    @property
    def size(self) -> int:
        return self.table.shape[0]


def primary_bucket(keys: np.ndarray, p: int) -> np.ndarray:
    return ((keys.astype(np.uint32) * HASH_MULT) >> np.uint32(32 - p)).astype(np.int64)


def secondary_bucket(keys: np.ndarray, s: int) -> np.ndarray:
    return ((keys.astype(np.uint32) * HASH_MULT2) >> np.uint32(32 - s)).astype(np.int64)


def _fill_level(
    table: np.ndarray, base: int, buckets: np.ndarray, packed: np.ndarray
):
    """Place each key at (base + bucket*W + rank-in-bucket); return the mask
    of overflow entries (rank >= W)."""
    order = np.argsort(buckets, kind="stable")
    b_sorted = buckets[order]
    first = np.concatenate(([True], b_sorted[1:] != b_sorted[:-1]))
    group_start = np.maximum.accumulate(np.where(first, np.arange(b_sorted.size), 0))
    rank = np.arange(b_sorted.size) - group_start
    fits = rank < BUCKET_W
    slots = base + b_sorted * BUCKET_W + rank
    table[slots[fits]] = packed[order][fits]
    overflow = np.zeros(buckets.size, dtype=bool)
    overflow[order[~fits]] = True
    return overflow


def build_table(
    keys: np.ndarray,
    values: np.ndarray,
    min_log2: int = 0,
    min_secondary_log2: int = 0,
) -> KmerHashTable:
    """Build from unique uint32 keys and uint32 values.  min_log2 /
    min_secondary_log2 (if given) are lower bounds on the bucket-count log2s
    (used to keep shards of a sharded index structurally identical)."""
    n = keys.shape[0]
    packed = (keys.astype(np.uint64) << np.uint64(32)) | values.astype(np.uint64)

    # primary: ~load 0.5 -> expected 4 occupants of 8 slots per bucket
    p = max(min_log2, max(3, int(np.ceil(np.log2(max(n, 2) / (BUCKET_W // 2))))))
    s = max(min_secondary_log2, 3, p - 3)

    while True:
        table = np.full(((1 << p) + (1 << s)) * BUCKET_W, EMPTY_SLOT, dtype=np.uint64)
        overflow = _fill_level(table, 0, primary_bucket(keys, p), packed)
        if overflow.any():
            over2 = _fill_level(
                table,
                (1 << p) * BUCKET_W,
                secondary_bucket(keys[overflow], s),
                packed[overflow],
            )
            if over2.any():
                s += 1  # secondary overflowed -- grow it and rebuild
                continue
        return KmerHashTable(table=table, primary_log2=p, secondary_log2=s)


def lookup_np(ht: KmerHashTable, queries: np.ndarray, missing: int) -> np.ndarray:
    """Host-side reference lookup (tests/oracle; the serving path is
    ops/probe.py)."""
    q64 = queries.astype(np.uint64)
    out = np.full(queries.shape, missing, dtype=np.uint32)
    found = np.zeros(queries.shape, dtype=bool)
    for base, bucket in (
        (0, primary_bucket(queries, ht.primary_log2)),
        ((1 << ht.primary_log2) * BUCKET_W, secondary_bucket(queries, ht.secondary_log2)),
    ):
        for w in range(BUCKET_W):
            slot = ht.table[base + bucket * BUCKET_W + w]
            key = slot >> np.uint64(32)
            hit = (~found) & (key == q64)
            out[hit] = (slot[hit] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            found |= hit
    return out
