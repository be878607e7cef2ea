import numpy as np
import pytest

from kaamer_tpu.index.build import dedup_sets
from kaamer_tpu.index.hashtable import build_table, lookup_np


def test_hashtable_roundtrip():
    rng = np.random.default_rng(0)
    keys = np.unique(rng.integers(0, 2**32 - 2, size=5000, dtype=np.uint32))
    vals = np.arange(keys.size, dtype=np.uint32)
    ht = build_table(keys, vals)
    assert ht.primary_log2 >= 3

    got = lookup_np(ht, keys, missing=0xFFFF)
    np.testing.assert_array_equal(got, vals)

    # absent keys miss
    absent = np.setdiff1d(
        rng.integers(0, 2**32 - 2, size=1000, dtype=np.uint32), keys
    )
    got = lookup_np(ht, absent, missing=0xFFFF)
    assert (got == 0xFFFF).all()


def test_dedup_sets_matches_bruteforce():
    rng = np.random.default_rng(1)
    # small synthetic pairs with repeated sets
    kmers = rng.integers(0, 50, size=400, dtype=np.uint64)
    rows = rng.integers(0, 10, size=400, dtype=np.uint64)
    pairs = np.sort((kmers << np.uint64(32)) | rows)

    uk, sid, soff, post = dedup_sets(pairs)

    # brute force
    ref = {}
    for p in pairs:
        ref.setdefault(int(p >> np.uint64(32)), set()).add(int(p & np.uint64(0xFFFFFFFF)))

    assert sorted(ref) == [int(k) for k in uk]
    seen_sets = {}
    for i, k in enumerate(uk):
        s = int(sid[i])
        lo, hi = int(soff[s]), int(soff[s + 1])
        got = sorted(int(x) for x in post[lo:hi])
        assert got == sorted(ref[int(k)]), f"kmer {k}"
        # identical sets must share a set id
        sig = tuple(got)
        if sig in seen_sets:
            assert seen_sets[sig] == s
        else:
            seen_sets[sig] = s
    # number of unique sets matches
    assert len(seen_sets) == soff.size - 1


def test_dedup_sets_empty():
    uk, sid, soff, post = dedup_sets(np.empty(0, dtype=np.uint64))
    assert uk.size == 0 and soff.size == 1
