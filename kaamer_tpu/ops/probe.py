"""Batched k-mer hash-probe on device.

The reference resolves each query k-mer with two Badger LSM point reads and a
protobuf unmarshal inside a goroutine loop (search.go:419-437).  Here the
entire batch is resolved against the in-HBM bucketed two-level table
(index/hashtable.py) with exactly TWO dense row-gathers -- one per level --
plus vectorized compares.  No data-dependent loops: on TPU a while-loop probe
pays per-iteration launch overhead and worst-case cluster depth; the bucketed
layout makes the probe shape static and load-independent.

Layout on device: one row of 16 uint32 PER BUCKET (columns 0..7 = keys,
8..15 = values), so each probe level is a single whole-row gather of 64
contiguous bytes per lane -- gather cost on TPU scales with the number of
gathered rows, not bytes, so wide rows are ~8x cheaper than one row per slot.
`bucketize_table` converts the on-disk packed-uint64 table to this layout.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..index.hashtable import BUCKET_W, HASH_MULT, HASH_MULT2

EMPTY_KEY = np.uint32(0xFFFFFFFF)


def bucketize_table(table_u64: np.ndarray) -> np.ndarray:
    """uint64[(2^p+2^s)*W] -> uint32[n_buckets, 2*W] with keys in columns
    [0, W) and values in columns [W, 2W)."""
    arr = np.ascontiguousarray(table_u64).view(np.uint32)
    arr = arr.reshape(-1, BUCKET_W, 2)  # little-endian: [...,0]=val, [...,1]=key
    out = np.empty((arr.shape[0], 2 * BUCKET_W), dtype=np.uint32)
    out[:, :BUCKET_W] = arr[:, :, 1]
    out[:, BUCKET_W:] = arr[:, :, 0]
    return out


def probe(table_b, queries, primary_log2: int, secondary_log2: int, miss_value):
    """Look up a batch of k-mer codes.

    table_b:  uint32[n_buckets, 2*W] device array (bucketize_table layout;
              primary buckets first, then secondary)
    queries:  uint32[...] k-mer codes
    returns:  uint32[...] values; `miss_value` where absent.
    """
    shape = queries.shape
    q = queries.reshape(-1)
    m = q.shape[0]

    out = jnp.full((m,), miss_value, dtype=jnp.uint32)
    found = jnp.zeros((m,), dtype=jnp.bool_)

    levels = (
        (0, HASH_MULT, np.uint32(32 - primary_log2)),
        (1 << primary_log2, HASH_MULT2, np.uint32(32 - secondary_log2)),
    )
    for base, mult, shift in levels:
        bucket = (base + ((q * mult) >> shift)).astype(jnp.int32)
        rows = jnp.take(table_b, bucket, axis=0)              # [m, 2W]
        keys = rows[:, :BUCKET_W]
        vals = rows[:, BUCKET_W:]
        hit = keys == q[:, None]                              # at most one slot
        anyhit = hit.any(axis=1)
        val = jnp.where(hit, vals, 0).sum(axis=1).astype(jnp.uint32)
        out = jnp.where(jnp.logical_and(anyhit, jnp.logical_not(found)), val, out)
        found = jnp.logical_or(found, anyhit)
    return out.reshape(shape)
