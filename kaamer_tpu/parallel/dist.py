"""Multi-host distributed runtime glue.

The reference is single-host (goroutines over one Badger instance); scale-out
here follows the standard JAX multi-controller pattern:

- every host runs the same program and calls `init_distributed()`
  (jax.distributed.initialize from env/args: coordinator address, process
  count, process id);
- `global_mesh(dp, shard)` builds a Mesh over ALL devices of the job, laid
  out so the "shard" axis stays within a host's chips wherever possible
  (index-shard collectives ride ICI; the dp axis crosses hosts over DCN);
- the sharded search step (mesh.make_sharded_search) is mesh-agnostic: the
  same all_to_all hit merge runs within one host or across a pod slice.

Index distribution across hosts: each host memory-maps the same artifact (or
its own replica) and feeds its devices their shard rows; shard ownership is a
pure function of the k-mer hash (mesh.shard_owner), so no coordination is
needed at build time.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-var fallbacks
    (KAAMER_COORDINATOR, KAAMER_NUM_PROCESSES, KAAMER_PROCESS_ID)."""
    import jax

    coordinator_address = coordinator_address or os.environ.get("KAAMER_COORDINATOR")
    if num_processes is None and "KAAMER_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["KAAMER_NUM_PROCESSES"])
    if process_id is None and "KAAMER_PROCESS_ID" in os.environ:
        process_id = int(os.environ["KAAMER_PROCESS_ID"])

    if coordinator_address is None:
        return  # single-process run

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(n_shards: Optional[int] = None):
    """(dp, shard) Mesh over all devices of the job.  By default the shard
    axis equals the local device count so index-shard collectives stay on
    ICI; the data-parallel axis spans hosts."""
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    n = devices.size
    if n_shards is None:
        n_shards = min(jax.local_device_count(), n)
    while n % n_shards:
        n_shards -= 1
    dp = n // n_shards
    return Mesh(devices.reshape(dp, n_shards), axis_names=("dp", "shard"))


class ShardedSearchEngine:
    """Counting engine over a sharded index on a (dp, shard) mesh.  Exposes
    the same count_batch contract as search.engine.SearchEngine, so the
    search pipelines can run unmodified on top of it."""

    def __init__(self, art, mesh=None, cap: int = 1 << 14, k: int = 64):
        import jax.numpy as jnp

        from ..search.engine import QueryCounts, _next_pow2  # noqa: F401
        from .mesh import make_sharded_search, shard_index

        self.art = art
        self.mesh = mesh or global_mesh()
        self.n_shards = self.mesh.shape["shard"]
        self.dp = self.mesh.shape["dp"]
        self.cap = cap
        self.k = k

        self.sharded = shard_index(art, self.n_shards)
        self.tables = jnp.asarray(self.sharded.tables)
        self.set_starts = jnp.asarray(self.sharded.set_starts)
        self.postings = jnp.asarray(self.sharded.postings)
        self._fn_cache = {}

        # host-side structures for position lookups (global index view)
        so = np.asarray(art.set_offsets)
        self.set_starts_np = np.concatenate([so, so[-1:]]).astype(np.int64)
        self.postings_np = np.asarray(art.postings)

    def _fn(self, cap: int, k: int):
        from .mesh import make_sharded_search

        key = (cap, k)
        if key not in self._fn_cache:
            self._fn_cache[key] = make_sharded_search(
                self.mesh, self.sharded.n_sets_padded,
                self.sharded.primary_log2, self.sharded.secondary_log2,
                cap=cap, k=k,
            )
        return self._fn_cache[key]

    def count_batch(self, seqs, sizes, k: int, positions: bool = False):
        from ..search.engine import QueryCounts
        from .mesh import replicate_query_batch

        if not seqs:
            return []
        k_eff = max(k, 32)
        codes, n_kmers = replicate_query_batch(
            seqs, sizes, batch_mult=self.dp * self.n_shards
        )
        counts, hit_rows = self._fn(self.cap, k_eff)(
            self.tables, self.set_starts, self.postings, codes, n_kmers
        )
        counts = np.asarray(counts)
        hit_rows = np.asarray(hit_rows)

        out = []
        for i, size in enumerate(sizes):
            c = counts[i]
            nz = c > 0
            qc = QueryCounts(hit_rows=hit_rows[i][nz], counts=c[nz])
            # positions resolve against the global CSR on host
            qc._offs, qc._lens = self._slices_for(seqs[i], size)
            out.append(qc)
        return out

    def dispatch_batch(self, seqs, sizes, k, positions: bool = False):
        # positions resolve against the global CSR on host (_slices_for),
        # so the flag needs no device-side work here
        return (seqs, sizes, k)

    def resolve_batch(self, handle):
        if handle is None:
            return []
        return self.count_batch(*handle)

    def _slices_for(self, seq: str, size: int):
        from .. import codec
        from ..index.hashtable import lookup_np, KmerHashTable

        if not hasattr(self, "_ht"):
            self._ht = KmerHashTable(
                table=np.asarray(self.art.hash_table),
                primary_log2=self.art.hash_primary_log2,
                secondary_log2=self.art.hash_secondary_log2,
            )
        kmers = codec.encode_kmers(codec.seq_to_codes(seq))[:size]
        n_sets = self.set_starts_np.size - 2
        ids = lookup_np(self._ht, kmers, missing=n_sets).astype(np.int64)
        starts = self.set_starts_np
        return starts[ids], starts[ids + 1] - starts[ids]

    def position_bitmaps(self, qc, hit_rows):
        from ..ops.count import member_np

        hits = np.asarray(list(hit_rows), dtype=np.uint32)
        if hits.size == 0 or qc.offs.size == 0:
            return {}
        found = member_np(self.postings_np, qc.offs, qc.lens, hits)
        return {int(h): found[j].tolist() for j, h in enumerate(hits)}
