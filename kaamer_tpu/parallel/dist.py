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

KMER_SIZE = 7


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
    the same dispatch/resolve contract as search.engine.SearchEngine, so the
    search pipelines (and their batch pipelining) run unmodified on top of
    it: queries ship packed 7 residues/uint32, device->host copies start at
    dispatch time, and the expansion capacity adapts to the observed
    shard-local postings volume just like the single-chip engine."""

    CAP_MIN = 1 << 8
    CAP_MAX = 1 << 18  # per-shard; the merge concatenates n_shards * cap

    def __init__(self, art, mesh=None, cap: int = 0, k: int = 64):
        import jax
        import jax.numpy as jnp

        from .mesh import shard_index

        self._jax = jax
        self.art = art
        self.mesh = mesh or global_mesh()
        self.n_shards = self.mesh.shape["shard"]
        self.dp = self.mesh.shape["dp"]
        self._cap_hint = cap or self.CAP_MIN
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

    def _fn(self, cap: int, k: int, width: int):
        from .mesh import make_sharded_search

        key = (cap, k, width)
        if key not in self._fn_cache:
            self._fn_cache[key] = make_sharded_search(
                self.mesh, self.sharded.n_sets_padded,
                self.sharded.primary_log2, self.sharded.secondary_log2,
                cap=cap, k=k, width=width,
            )
        return self._fn_cache[key]

    def count_batch(self, seqs, sizes, k: int, positions: bool = False):
        return self.resolve_batch(self.dispatch_batch(seqs, sizes, k,
                                                      positions=positions))

    def _run(self, wire_np, n_np, cap, k_eff, width):
        import jax.numpy as jnp

        outs = self._fn(cap, k_eff, width)(
            self.tables, self.set_starts, self.postings,
            jnp.asarray(wire_np), jnp.asarray(n_np),
        )
        for arr in outs:
            arr.copy_to_host_async()
        return outs

    def dispatch_batch(self, seqs, sizes, k, positions: bool = False):
        from .. import codec
        from ..search.engine import TOPK_MIN, _next_pow2

        if not seqs:
            return None
        mult = self.dp * self.n_shards
        B0 = len(seqs)
        # divisible by dp*shard AND shape-bucketed (pow2 multiples of mult)
        B = mult * _next_pow2(-(-B0 // mult))
        padded = list(seqs) + [""] * (B - B0)
        L = _next_pow2(max(max(sizes), 8))
        width = L + KMER_SIZE - 1
        codes = codec.pad_codes_batch(padded, width)
        wire = codec.pack_codes7(codes)
        n_np = np.zeros(B, dtype=np.int32)
        n_np[:B0] = sizes

        cap = max(self._cap_hint, self.CAP_MIN)
        k_eff = min(_next_pow2(max(k, TOPK_MIN)), cap * self.n_shards)
        outs = self._run(wire, n_np, cap, k_eff, width)
        return (outs, wire, n_np, list(seqs), list(sizes), k, k_eff, cap, width)

    def resolve_batch(self, handle):
        from ..search.engine import TOPK_MIN, QueryCounts, _cap_bucket, _next_pow2

        if handle is None:
            return []
        (outs, wire, n_np, seqs, sizes, k, k_eff, cap, width) = handle
        while True:
            counts, hit_rows, totals = self._jax.device_get(tuple(outs))
            max_total = int(totals.max())
            if max_total <= cap or cap >= self.CAP_MAX:
                break
            cap = min(_cap_bucket(max_total), self.CAP_MAX)
            k_eff = min(_next_pow2(max(k, TOPK_MIN)), cap * self.n_shards)
            outs = self._run(wire, n_np, cap, k_eff, width)
        self._cap_hint = min(_cap_bucket(max_total + (max_total >> 4)),
                             self.CAP_MAX)

        overflow = totals > self.CAP_MAX
        slices = _LazyBatchSlices(self, seqs, sizes)
        out = []
        for i, size in enumerate(sizes):
            if overflow[i]:
                # exact host fallback for postings-heavy outliers, matching
                # the single-chip engine (sharded stays bit-identical to it)
                qc = self._count_host_row(slices, i, size, k_eff)
            else:
                c = counts[i]
                nz = c > 0
                qc = QueryCounts(hit_rows=hit_rows[i][nz], counts=c[nz],
                                 _engine=self, _batch=slices, _row=i,
                                 _n_kmers=size)
            out.append(qc)
        return out

    def _count_host_row(self, slices: "_LazyBatchSlices", i: int,
                        n_kmers: int, k: int):
        from ..search.engine import QueryCounts

        ids = slices.host()[i, :n_kmers].astype(np.int64)
        starts = self.set_starts_np
        offs = starts[ids]
        lens = starts[ids + 1] - starts[ids]
        segs = [self.postings_np[int(o): int(o) + int(l)]
                for o, l in zip(offs, lens) if l > 0]
        if segs:
            rows = np.concatenate(segs)
            bc = np.bincount(rows)
            nz = np.flatnonzero(bc)
            order = np.lexsort((nz, -bc[nz]))[:k]
            hit_rows = nz[order].astype(np.uint32)
            counts = bc[hit_rows].astype(np.int32)
        else:
            hit_rows = np.empty(0, np.uint32)
            counts = np.empty(0, np.int32)
        qc = QueryCounts(hit_rows=hit_rows, counts=counts, _engine=self,
                         _n_kmers=n_kmers)
        qc._offs = offs
        qc._lens = lens
        return qc

    def position_bitmaps(self, qc, hit_rows):
        return {k: v.tolist()
                for k, v in self.position_bitmaps_np(qc, hit_rows).items()}

    def position_bitmaps_np(self, qc, hit_rows):
        from ..ops.count import member_np

        hits = np.asarray(list(hit_rows), dtype=np.uint32)
        if hits.size == 0 or qc.offs.size == 0:
            return {}
        found = member_np(self.postings_np, qc.offs, qc.lens, hits)
        return {int(h): found[j] for j, h in enumerate(hits)}


class _LazyBatchSlices:
    """Per-batch lazy global k-mer -> set-id resolution for position
    lookups: one vectorized host probe for the whole batch, computed only
    if some query actually needs position bitmaps (mirrors the single-chip
    engine's lazy device-ids pull)."""

    def __init__(self, engine: "ShardedSearchEngine", seqs, sizes):
        self._engine = engine
        self._seqs = seqs
        self._sizes = sizes
        self._ids = None

    def host(self) -> np.ndarray:
        if self._ids is None:
            from .. import codec
            from ..index.hashtable import KmerHashTable, lookup_np

            eng = self._engine
            if not hasattr(eng, "_ht"):
                eng._ht = KmerHashTable(
                    table=np.asarray(eng.art.hash_table),
                    primary_log2=eng.art.hash_primary_log2,
                    secondary_log2=eng.art.hash_secondary_log2,
                )
            n_sets = eng.set_starts_np.size - 2
            L = max(self._sizes) if self._sizes else 1
            width = L + KMER_SIZE - 1
            codes = codec.pad_codes_batch(self._seqs, width)
            kmers = codec.encode_kmers_batch(codes.astype(np.int32))  # [B, L]
            ids = lookup_np(eng._ht, kmers.reshape(-1), missing=n_sets)
            ids = ids.reshape(kmers.shape).astype(np.uint32)
            lane = np.arange(L)[None, :]
            sizes = np.asarray(self._sizes)[:, None]
            self._ids = np.where(lane < sizes, ids, np.uint32(n_sets))
        return self._ids
