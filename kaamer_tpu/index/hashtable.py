"""Open-addressing k-mer hash table (build side).

Replaces the reference's Badger LSM point lookups (kv_store.go:157-204) with
an immutable open-addressing table designed for batched device probes:

- One uint64 slot per entry: (kmer_key << 32) | value.  A single gather per
  probe step fetches both key and value.
- Multiplicative hashing (Fibonacci constant) taking the TOP log2(H) bits,
  then linear probing, so probe sequences are contiguous in memory.
- Load factor <= 0.5; the builder records the worst-case probe length so the
  device kernel can run a static, unrolled probe loop.

The build is fully vectorized numpy: every round tries to place all still
-pending keys; first-come-wins conflicts are resolved with np.unique and the
losers advance one slot.  Rounds == final max probe distance (tens at most).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# Fibonacci multiplicative hashing constant (2^32 / golden ratio), as used in
# many open hash tables; public-domain technique.
HASH_MULT = np.uint32(0x9E3779B1)

EMPTY_SLOT = np.uint64(0xFFFFFFFF) << np.uint64(32)  # key=0xFFFFFFFF, val=0


@dataclass
class KmerHashTable:
    table: np.ndarray  # uint64[2**log2_size]; (key<<32)|value, EMPTY_SLOT if free
    log2_size: int
    max_probe: int

    @property
    def size(self) -> int:
        return 1 << self.log2_size


def hash_positions(keys: np.ndarray, log2_size: int) -> np.ndarray:
    """Initial probe position for each uint32 key (top log2_size bits of the
    multiplicative hash)."""
    shift = np.uint32(32 - log2_size)
    return ((keys.astype(np.uint32) * HASH_MULT) >> shift).astype(np.int64)


def build_table(keys: np.ndarray, values: np.ndarray, min_log2: int = 8) -> KmerHashTable:
    """Build the table from unique uint32 keys and uint32 values."""
    n = keys.shape[0]
    log2_size = max(min_log2, int(np.ceil(np.log2(max(2 * n, 2)))))
    H = 1 << log2_size
    mask = np.int64(H - 1)

    table = np.full(H, EMPTY_SLOT, dtype=np.uint64)
    packed = (keys.astype(np.uint64) << np.uint64(32)) | values.astype(np.uint64)

    pos = hash_positions(keys, log2_size)
    pending = np.arange(n, dtype=np.int64)
    max_probe = 0

    while pending.size:
        p = pos[pending]
        # Unique target slots; the first pending key per slot is the candidate.
        uniq_slots, first_idx = np.unique(p, return_index=True)
        free = table[uniq_slots] == EMPTY_SLOT
        winners = pending[first_idx[free]]
        table[uniq_slots[free]] = packed[winners]

        placed = np.zeros(pending.size, dtype=bool)
        placed[first_idx[free]] = True
        losers = pending[~placed]
        pos[losers] = (pos[losers] + 1) & mask
        pending = losers
        if pending.size:
            max_probe += 1

    return KmerHashTable(table=table, log2_size=log2_size, max_probe=max_probe + 1)


def lookup_np(ht: KmerHashTable, queries: np.ndarray, missing: int) -> np.ndarray:
    """Host-side vectorized probe (oracle/tests; the serving path uses the
    device implementation in ops/probe.py)."""
    H = ht.size
    mask = np.int64(H - 1)
    pos = hash_positions(queries, ht.log2_size)
    out = np.full(queries.shape, missing, dtype=np.uint32)
    found = np.zeros(queries.shape, dtype=bool)
    qk = queries.astype(np.uint64)
    for _ in range(ht.max_probe):
        slot = ht.table[pos]
        key = slot >> np.uint64(32)
        hit = (~found) & (key == qk)
        out[hit] = (slot[hit] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        found |= hit | (slot == EMPTY_SLOT)
        pos = (pos + 1) & mask
    return out
