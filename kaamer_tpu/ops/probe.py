"""Batched k-mer hash-probe on device.

The reference resolves each query k-mer with two Badger LSM point reads and a
protobuf unmarshal inside a goroutine loop (search.go:419-437).  Here the
entire batch is resolved at once against the in-HBM open-addressing table:
a vectorized multiplicative-hash + linear-probe loop where every round is one
XLA row-gather over the packed table, and the loop exits as soon as every
lane has hit or proven a miss (expected ~2 rounds at load factor 0.5).

The table is the uint64 array built by index.hashtable, viewed on device as
uint32[H, 2] (little-endian: column 0 = value, column 1 = key) so key and
value arrive in a single gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

HASH_MULT = np.uint32(0x9E3779B1)
EMPTY_KEY = np.uint32(0xFFFFFFFF)


def probe(table2, queries, log2_size: int, max_probe: int, miss_value):
    """Look up a batch of k-mer codes.

    table2:   uint32[H, 2] device array (col 0 value, col 1 key)
    queries:  uint32[...] k-mer codes
    returns:  uint32[...] set ids; `miss_value` where absent.
    """
    shape = queries.shape
    q = queries.reshape(-1)
    m = q.shape[0]
    mask = np.int32((1 << log2_size) - 1)
    shift = np.uint32(32 - log2_size)

    idx0 = ((q * HASH_MULT) >> shift).astype(jnp.int32)
    out0 = jnp.full((m,), miss_value, dtype=jnp.uint32)
    done0 = jnp.zeros((m,), dtype=jnp.bool_)

    def cond(state):
        i, _, done, _ = state
        return jnp.logical_and(i < max_probe, jnp.logical_not(jnp.all(done)))

    def body(state):
        i, idx, done, out = state
        slot = jnp.take(table2, idx, axis=0)  # [m, 2] single gather
        val, key = slot[:, 0], slot[:, 1]
        hit = jnp.logical_and(key == q, jnp.logical_not(done))
        out = jnp.where(hit, val, out)
        done = jnp.logical_or(done, jnp.logical_or(hit, key == EMPTY_KEY))
        idx = jnp.where(done, idx, (idx + 1) & mask)
        return i + 1, idx, done, out

    _, _, _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), idx0, done0, out0))
    return out.reshape(shape)
