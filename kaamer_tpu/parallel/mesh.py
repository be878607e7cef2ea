"""Multi-device search: data-parallel queries over a sharded k-mer index.

The reference is a single-host Go program whose only parallelism is goroutine
pools over one Badger instance (SURVEY §2.3).  The TPU-native scale-out:

- Mesh axes (dp, shard): "dp" shards query batches (data parallel); "shard"
  shards the INDEX by k-mer ownership (hash top bits), the hash-table
  analogue of tensor parallelism.
- Per device: probe its index shard with the full dp-local query batch and
  expand its postings contribution [B, cap].
- lax.all_to_all over "shard" redistributes contributions so each device
  finalizes B/n_shards queries with ALL shards' postings [B/n, n*cap]
  (the "all-to-all hit return" of BASELINE.json's north star), then
  sort + RLE + top_k locally.
- Counts merge exactly: every (kmer -> protein) posting lives on exactly one
  shard, so concatenation before RLE reproduces single-chip counts.

Works identically on real multi-chip meshes and on virtual CPU device meshes
(XLA_FLAGS=--xla_force_host_platform_device_count=N).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import numpy as np

from ..index.hashtable import HASH_MULT, build_table, occupied_entries
from ..index.artifact import DBArtifact

KMER_SIZE = 7


def _next_pow2(n: int) -> int:
    return 1 << max(0, int(np.ceil(np.log2(max(n, 1)))))


@dataclass
class ShardedIndexArrays:
    """Host-side per-shard index arrays, padded to uniform shapes.

    tables:      uint32[n_shards, rows, 6]  (hashtable.py cuckoo layout,
                 values = shard-LOCAL postings (start, len) inline)
    postings:    uint32[n_shards, P_max]
    """

    tables: np.ndarray
    postings: np.ndarray
    hash_log2: int
    n_shards: int


def shard_owner(kmers: np.ndarray, n_shards: int) -> np.ndarray:
    """Owner shard of each k-mer: top bits of the multiplicative hash (the
    SAME hash family as slot placement uses lower-order of; ownership uses
    the highest bits so in-shard placement stays uniform)."""
    h = kmers.astype(np.uint32) * HASH_MULT
    return ((h.astype(np.uint64) * np.uint64(n_shards)) >> np.uint64(32)).astype(np.int64)


def shard_index(art: DBArtifact, n_shards: int) -> ShardedIndexArrays:
    """Split an indexed artifact into per-shard probe structures."""
    return shard_index_arrays(
        np.asarray(art.hash_table),
        np.asarray(art.set_offsets),
        np.asarray(art.postings),
        n_shards,
    )


def shard_index_arrays(
    hash_table: np.ndarray,
    set_offsets: np.ndarray,
    postings: np.ndarray,
    n_shards: int,
) -> ShardedIndexArrays:
    kmers, g_starts, g_lens = occupied_entries(np.ascontiguousarray(hash_table))
    # dense global set ids, recovered from the inline starts (set starts are
    # strictly increasing; see hashtable.py)
    set_ids = np.searchsorted(set_offsets, g_starts.astype(np.uint64),
                              side="left").astype(np.uint32)

    global_starts = set_offsets

    owners = shard_owner(kmers, n_shards)

    shard_posts = []
    shard_keys = []
    shard_starts_v = []
    shard_lens_v = []
    for s in range(n_shards):
        sel = owners == s
        k_s = kmers[sel]
        sid_s = set_ids[sel]
        # unique sets used by this shard, re-indexed locally
        uniq_sets, local_ids = np.unique(sid_s, return_inverse=True)
        lens = (global_starts[uniq_sets + 1] - global_starts[uniq_sets]).astype(np.int64)
        starts_local = np.zeros(uniq_sets.size + 1, dtype=np.int64)
        np.cumsum(lens, out=starts_local[1:])
        total = int(starts_local[-1])
        post_local = np.empty(total, dtype=np.uint32)
        src = (
            np.repeat(global_starts[uniq_sets].astype(np.int64), lens)
            + np.arange(total, dtype=np.int64)
            - np.repeat(starts_local[:-1], lens)
        )
        post_local[:] = postings[src]

        shard_keys.append(k_s)
        shard_starts_v.append(starts_local[local_ids].astype(np.uint32))
        shard_lens_v.append(lens[local_ids].astype(np.uint32))
        shard_posts.append(post_local)

    # build with a shared table size so all shard tables stack shape-
    # identically; grow the common log2 until every shard converges at it
    common_t = 0
    while True:
        shard_tables = [
            build_table(k, st, ln, min_log2=common_t)
            for k, st, ln in zip(shard_keys, shard_starts_v, shard_lens_v)
        ]
        t_max = max(t.log2 for t in shard_tables)
        if all(t.log2 == t_max for t in shard_tables):
            common_t = t_max
            break
        common_t = t_max

    P_max = max(1, _next_pow2(max(p.size for p in shard_posts)))
    tables = np.stack([t.table for t in shard_tables])
    posts_pad = np.zeros((n_shards, P_max), dtype=np.uint32)
    for s in range(n_shards):
        posts_pad[s, : shard_posts[s].size] = shard_posts[s]

    return ShardedIndexArrays(
        tables=tables,
        postings=posts_pad,
        hash_log2=common_t,
        n_shards=n_shards,
    )


# ---------------------------------------------------------------------------
# Device-side sharded search step
# ---------------------------------------------------------------------------


def make_sharded_search(mesh, hash_log2: int, cap: int, k: int,
                        width: int = 0, positions: bool = False):
    """Build the jitted multi-device search step over `mesh` with axes
    ("dp", "shard").

    Returns fn(tables, postings, codes, n_kmers) ->
    (counts int32[B, k], hit_rows uint32[B, k], totals int32[B]
    [, bitmaps uint8[B, k, L//8]]) with B divisible by dp * shard sizes.
    `codes` is int32[B, L+6] residue codes, or -- when width == L+6 is given
    -- the packed uint32 wire format from codec.pack_codes7 (7 residues/word;
    what ships over DCN on multi-host meshes).  `totals` is each query's
    maximum shard-local postings volume, driving the adaptive capacity
    exactly like the single-chip engine.

    With positions=True the per-hit k-mer position bitmaps are computed on
    device from the all-to-all-merged expansion (the k-mer position index of
    every expanded entry travels with its row through the same collective),
    exactly like the single-chip fused kernel's MXU one-hot path.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from .. import codec
    from ..ops.count import (count_topk, dedup_runs, gather_postings,
                             member_bitmap_from_rows, pack_bits)
    from ..ops.probe import probe_slices

    def local_step(table_b, postings, codes, n_kmers):
        # shapes inside shard_map (per device):
        # table_b [1, rows, 6] (shard-local (start, len) inline);
        # postings [1, P]; codes [B_dp, ...] (replicated over "shard");
        # n_kmers [B_dp]
        table_b = table_b[0]
        postings = postings[0]

        if width:
            codes_i = codec.unpack_codes7_jnp(codes, width)
        else:
            codes_i = codes
        L = codes_i.shape[1] - (KMER_SIZE - 1)
        kmers = jax.vmap(lambda c: codec.encode_kmers_jnp(c, L))(codes_i)
        # the miss sentinel must not equal any REAL shard-local slice start
        # or run-dedup below would merge a miss into a neighboring real run;
        # the (padded) postings length can never be a real start
        miss_start = postings.shape[0]
        starts, lens = probe_slices(table_b, kmers, hash_log2,
                                    miss_start=miss_start)
        lane = jnp.arange(L, dtype=jnp.int32)[None, :]
        in_query = lane < n_kmers[:, None]
        offs = jnp.where(in_query, starts,
                         jnp.uint32(miss_start)).astype(jnp.int32)
        lens = jnp.where(in_query, lens, 0).astype(jnp.int32)
        if positions:
            # per-shard run structures cannot be recovered after the
            # all-to-all merge, so position batches expand undeduplicated
            # (results identical; only the expansion volume differs)
            cum = jnp.cumsum(lens, axis=1).astype(jnp.int32)
            total = cum[:, -1]
            rows, seg, _ = gather_postings(postings, offs, cum, total, cap)
            weights = None
        else:
            # query-time KComb (ops/count.py:dedup_runs), per shard
            lens_u, wstart, _ = dedup_runs(offs, lens)
            cum = jnp.cumsum(lens_u, axis=1).astype(jnp.int32)
            total = cum[:, -1]
            rows, seg, _, w = gather_postings(postings, offs, cum, total,
                                              cap, wstart=wstart)
            weights = jax.lax.all_to_all(
                w, "shard", split_axis=0, concat_axis=1, tiled=True
            )

        # every shard holds a disjoint postings subset; swap so each device
        # finalizes B_dp/n_shards queries over all shards' contributions
        rows_ex = jax.lax.all_to_all(
            rows, "shard", split_axis=0, concat_axis=1, tiled=True
        )
        counts, hit_rows = count_topk(rows_ex, k, weights=weights)
        # max shard-local volume per query, for host-side cap adaptation;
        # swap like the rows so each device reports the queries it finalized
        tmax = jax.lax.pmax(total, "shard")
        tmax = jax.lax.all_to_all(
            tmax[:, None], "shard", split_axis=0, concat_axis=1, tiled=True
        )[:, 0]
        if not positions:
            return counts, hit_rows, tmax
        # the per-entry k-mer position rides the same all_to_all as rows, so
        # the merged expansion keeps (row, position) pairs aligned
        seg_ex = jax.lax.all_to_all(
            seg, "shard", split_axis=0, concat_axis=1, tiled=True
        )
        found = member_bitmap_from_rows(rows_ex, seg_ex, hit_rows, L)
        found = found & (counts[:, :, None] > 0)
        return counts, hit_rows, tmax, pack_bits(found)

    out_specs = [P(("dp", "shard"), None), P(("dp", "shard"), None),
                 P(("dp", "shard"),)]
    if positions:
        out_specs.append(P(("dp", "shard"), None, None))
    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P("shard", None, None),   # tables
            P("shard", None),         # postings
            P("dp", None),            # codes (replicated over shard)
            P("dp",),                 # n_kmers
        ),
        out_specs=tuple(out_specs),
        # codes are replicated over "shard" while table gathers vary over it;
        # the probe loop carry mixes the two, so disable the vma check
        check_vma=False,
    )
    return jax.jit(fn)


def replicate_query_batch(seqs, sizes, batch_mult: int):
    """Pad a query batch so B is divisible by dp*shard, returning codes and
    n_kmers arrays (padding queries have 0 k-mers)."""
    from .. import codec as _codec

    B0 = len(seqs)
    B = max(batch_mult, ((B0 + batch_mult - 1) // batch_mult) * batch_mult)
    L = _next_pow2(max(max(sizes), 8) if sizes else 8)
    codes = np.full((B, L + KMER_SIZE - 1), -1, dtype=np.int32)
    n_kmers = np.zeros(B, dtype=np.int32)
    for i, s in enumerate(seqs):
        c = _codec.seq_to_codes(s)[: L + KMER_SIZE - 1]
        codes[i, : c.shape[0]] = c
        n_kmers[i] = sizes[i]
    return codes, n_kmers
