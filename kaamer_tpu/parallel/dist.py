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

from ..search.engine import PositionBitmapServing

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


class ShardedSearchEngine(PositionBitmapServing):
    """Counting engine over a sharded index on a (dp, shard) mesh.  Exposes
    the same dispatch/resolve contract as search.engine.SearchEngine, so the
    search pipelines (and their batch pipelining) run unmodified on top of
    it: queries ship packed 7 residues/uint32 (native kt_pack_queries when
    available), device->host copies start at dispatch time, the expansion
    capacity adapts to the observed shard-local postings volume, position
    bitmaps are computed on device from the all-to-all-merged expansion, and
    overflowing queries are re-run selectively in bounded sub-batches --
    feature parity with the single-chip engine, bit-identical results
    (tests/test_dist.py)."""

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
        self.postings = jnp.asarray(self.sharded.postings)
        self._fn_cache = {}

        # host-side structures for position lookups (global index view)
        so = np.asarray(art.set_offsets)
        self.set_starts_np = np.concatenate([so, so[-1:]]).astype(np.int64)
        self.postings_np = np.asarray(art.postings)

    def _fn(self, cap: int, k: int, width: int, positions: bool):
        from .mesh import make_sharded_search

        key = (cap, k, width, positions)
        if key not in self._fn_cache:
            self._fn_cache[key] = make_sharded_search(
                self.mesh, self.sharded.hash_log2,
                cap=cap, k=k, width=width, positions=positions,
            )
        return self._fn_cache[key]

    def count_batch(self, seqs, sizes, k: int, positions: bool = False):
        return self.resolve_batch(self.dispatch_batch(seqs, sizes, k,
                                                      positions=positions))

    def _run(self, wire_np, n_np, cap, k_eff, width, positions):
        import jax.numpy as jnp

        outs = self._fn(cap, k_eff, width, positions)(
            self.tables, self.postings,
            jnp.asarray(wire_np), jnp.asarray(n_np),
        )
        for arr in outs:
            arr.copy_to_host_async()
        return outs

    def _pos_on_device(self, cap: int, k_eff: int, L: int) -> bool:
        # the merged expansion each device finalizes is n_shards * cap wide
        from ..search.engine import _positions_on_device

        return _positions_on_device(cap * self.n_shards, k_eff, L, 2048)

    def _pack(self, padded, width):
        from .. import codec, native

        wire = native.pack_queries(padded, width)
        if wire is None:
            wire = codec.pack_codes7(codec.pad_codes_batch(padded, width))
        return wire

    def dispatch_batch(self, seqs, sizes, k, positions: bool = False,
                       cap: int = 0, adapt_hint: bool = True):
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
        wire = self._pack(padded, width)
        n_np = np.zeros(B, dtype=np.int32)
        n_np[:B0] = sizes

        from ..search.engine import _cap_clamp

        # whole-batch expansion budget per device is B_local * cap; clamp
        # like the single-chip engine (outliers re-run in bounded chunks)
        cap = _cap_clamp(cap or max(self._cap_hint, self.CAP_MIN),
                         B // (self.dp * self.n_shards) * self.n_shards)
        k_eff = min(_next_pow2(max(k, TOPK_MIN)), cap * self.n_shards)
        pos_dev = positions and self._pos_on_device(cap, k_eff, L)
        outs = self._run(wire, n_np, cap, k_eff, width, pos_dev)
        return (outs, wire, n_np, list(seqs), list(sizes), k, k_eff, cap,
                width, positions, adapt_hint)

    def resolve_batch(self, handle):
        from ..search.engine import QueryCounts, _cap_bucket

        if handle is None:
            return []
        (outs, wire, n_np, seqs, sizes, k, k_eff, cap, width, positions,
         adapt_hint) = handle
        counts, hit_rows, totals = self._jax.device_get(tuple(outs[:3]))
        bitmaps_h = None
        if len(outs) > 3:
            bitmaps_h = np.unpackbits(self._jax.device_get(outs[3]),
                                      axis=-1, bitorder="little")
        max_total = int(totals.max())
        if adapt_hint:
            self._cap_hint = min(_cap_bucket(max_total + (max_total >> 4)),
                                 self.CAP_MAX)

        slices = _LazyBatchSlices(self, seqs, sizes)
        over_idx = [i for i in range(len(sizes)) if int(totals[i]) > cap]
        rerun = (
            self._rerun_overflow(wire, sizes, over_idx, totals, slices, k,
                                 width, positions)
            if over_idx
            else {}
        )
        out = []
        for i, size in enumerate(sizes):
            if i in rerun:
                qc = rerun[i]
            else:
                c = counts[i]
                nz = c > 0
                qc = QueryCounts(hit_rows=hit_rows[i][nz], counts=c[nz],
                                 _engine=self, _batch=slices, _row=i,
                                 _n_kmers=size)
                if bitmaps_h is not None:
                    qc._bitmaps = bitmaps_h[i]
            out.append(qc)
        return out

    def _rerun_overflow(self, wire, sizes, over_idx, totals, slices, k,
                        width, positions):
        """Re-run overflowing queries in bounded sub-batches at the cap
        bucket they need (mirrors SearchEngine._rerun_overflow; peak device
        memory stays B_sub * n_shards * CAP_MAX elements)."""
        from ..search.engine import (TOPK_MIN, QueryCounts, _cap_bucket,
                                     _next_pow2)

        out = {}
        mult = self.dp * self.n_shards
        B_sub = mult * max(1, -(-16 // mult))
        L = width - (KMER_SIZE - 1)
        k_full = _next_pow2(max(k, TOPK_MIN))
        dev_rows = []
        for i in over_idx:
            if int(totals[i]) > self.CAP_MAX:
                # exact host fallback for postings-heavy outliers, matching
                # the single-chip engine (sharded stays bit-identical to it)
                out[i] = self._count_host_row(slices, i, sizes[i], k_full)
            else:
                dev_rows.append(i)
        dev_rows.sort(key=lambda i: int(totals[i]))
        for c0 in range(0, len(dev_rows), B_sub):
            chunk = dev_rows[c0 : c0 + B_sub]
            # pow2 caps on re-runs: fewer compiled shapes (see the
            # single-chip engine's rationale)
            cap2 = min(_next_pow2(max(int(totals[i]) for i in chunk)),
                       self.CAP_MAX)
            k2 = min(k_full, cap2 * self.n_shards)
            wire2 = np.zeros((B_sub,) + wire.shape[1:], wire.dtype)
            n2 = np.zeros(B_sub, dtype=np.int32)
            for j, i in enumerate(chunk):
                wire2[j] = wire[i]
                n2[j] = sizes[i]
            pos_dev = positions and self._pos_on_device(cap2, k2, L)
            outs = self._run(wire2, n2, cap2, k2, width, pos_dev)
            ch, hh = self._jax.device_get((outs[0], outs[1]))
            bm = None
            if len(outs) > 3:
                bm = np.unpackbits(self._jax.device_get(outs[3]), axis=-1,
                                   bitorder="little")
            for j, i in enumerate(chunk):
                c = ch[j]
                nz = c > 0
                qc = QueryCounts(hit_rows=hh[j][nz], counts=c[nz],
                                 _engine=self, _batch=slices, _row=i,
                                 _n_kmers=sizes[i])
                if bm is not None:
                    qc._bitmaps = bm[j]
                out[i] = qc
        return out

    def warmup(self, batch_sizes=(16, 2048), lengths=(64, 128, 256, 512),
               positions=(False, True), caps=(CAP_MIN,)) -> None:
        """Pre-compile the common shape buckets without touching the
        adaptive cap hint (same contract as SearchEngine.warmup)."""
        for B in batch_sizes:
            for L in lengths:
                for pos in positions:
                    for capv in caps:
                        try:
                            seq = "A" * min(L + KMER_SIZE - 1, 64)
                            seqs_w = [seq] * B
                            sizes_w = ([len(seq) - KMER_SIZE + 1] * (B - 1)
                                       + [L])
                            self.resolve_batch(self.dispatch_batch(
                                seqs_w, sizes_w, k=10, positions=pos,
                                cap=capv, adapt_hint=False))
                        except Exception:
                            pass

    def _count_host_row(self, slices: "_LazyBatchSlices", i: int,
                        n_kmers: int, k: int):
        from ..search.engine import QueryCounts

        offs = slices.host()[i, :n_kmers].astype(np.int64)
        starts = self.set_starts_np
        ids = np.searchsorted(starts, offs, side="left")
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

class _LazyBatchSlices:
    """Per-batch lazy global k-mer -> slice-start resolution for position
    lookups: one vectorized host probe of the global artifact table for the
    whole batch, computed only if some query actually needs position bitmaps
    (mirrors the single-chip engine's lazy device-offs pull)."""

    def __init__(self, engine: "ShardedSearchEngine", seqs, sizes):
        self._engine = engine
        self._seqs = seqs
        self._sizes = sizes
        self._offs = None

    def host(self) -> np.ndarray:
        if self._offs is None:
            from .. import codec
            from ..index.hashtable import CuckooTable, lookup_np

            eng = self._engine
            if not hasattr(eng, "_ht"):
                eng._ht = CuckooTable(
                    table=np.asarray(eng.art.hash_table),
                    log2=eng.art.hash_log2,
                )
            miss = int(eng.set_starts_np[-1])  # global P -> empty-set id
            L = max(self._sizes) if self._sizes else 1
            width = L + KMER_SIZE - 1
            codes = codec.pad_codes_batch(self._seqs, width)
            kmers = codec.encode_kmers_batch(codes.astype(np.int32))  # [B, L]
            starts, _ = lookup_np(eng._ht, kmers.reshape(-1), miss_start=miss)
            starts = starts.reshape(kmers.shape).astype(np.uint32)
            lane = np.arange(L)[None, :]
            sizes = np.asarray(self._sizes)[:, None]
            self._offs = np.where(lane < sizes, starts, np.uint32(miss))
        return self._offs
