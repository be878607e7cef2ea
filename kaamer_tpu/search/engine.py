"""Batched device search engine.

The serving pipeline (replacing the per-k-mer LSM pointer chase of reference
search.go:414-440 with static-shaped device batches):

  host: read queries, bucket by length, pad residue codes to int8[B, L+K-1]
  dev : encode 7-mers -> hash probe -> postings CSR expand -> sort ->
        run-length encode -> top_k     (ONE fused jit call per shape bucket)
  host: reference-exact filtering (FilterResults, search.go:189-220),
        position bitmaps, formatting.

Transfer discipline (the chip may sit behind a high-latency link): one int8
upload per batch, one small device_get of (counts, hit_rows, totals) back.
The postings expansion capacity `cap` is a power-of-two bucket chosen
adaptively; when a batch's true postings volume exceeds it, the batch is
re-run at the next bucket (compile caches make this cheap), and beyond
CAP_MAX single queries fall back to a host bincount.  Per-k-mer set ids stay
on device and are pulled lazily, only when position bitmaps are requested.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence

import numpy as np

from .. import codec
from ..index.artifact import DBArtifact

KMER_SIZE = 7
CAP_MAX = 1 << 21
CAP_MIN = 1 << 8
# MinKMatch/MinKRatio are monotone in Kmatch and hits are ranked by Kmatch
# desc, so FilterResults keeps a PREFIX of the ranked list; top-k with
# k >= MaxResults is therefore exact.  16 leaves slack for small MaxResults.
TOPK_MIN = 16


def _next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length() if n > 1 else 1


def _positions_on_device(cap: int, k: int, L: int) -> bool:
    """Whether the MXU bitmap path fits: both the [B, cap, L] and
    [B, cap, k] bf16 indicators must stay bounded (< ~0.5 GB at B=2048).
    Beyond this the lazy host binary-search path wins, since it only
    touches the few kept hits of gate-passing queries."""
    return cap * L <= (1 << 17) and cap * k <= (1 << 17)


def _cap_bucket(n: int) -> int:
    """Smallest allowed expansion capacity >= n.

    Allowed capacities are {2^k, 1.25*2^k, 1.5*2^k} (all multiples of 64 for
    k >= 8): device execution scales with B*L*cap, so the finer-than-pow2
    grid avoids paying 2x when the workload's postings volume sits just past
    a power of two (e.g. max totals 262 -> cap 320, not 512).
    """
    n = max(int(n), CAP_MIN)
    if n >= CAP_MAX:
        return CAP_MAX
    p = _next_pow2(n)
    h = p >> 1
    for c in (h + (h >> 2), h + (h >> 1)):
        if c >= n:
            return c
    return p


class QueryCounts:
    """Raw counting result for one query: top hits (dense rows) with their
    k-match counts, plus lazily materialized per-k-mer postings slices for
    position lookups.  Slotted plain class: one is built per query, so
    construction cost is on the serving hot path."""

    __slots__ = ("hit_rows", "counts", "_engine", "_batch", "_row",
                 "_n_kmers", "_offs", "_lens", "_bitmaps")

    def __init__(self, hit_rows, counts, _engine=None, _batch=None,
                 _row=0, _n_kmers=0):
        self.hit_rows = hit_rows    # uint32[k'] dense protein rows, count desc
        self.counts = counts        # int32[k']
        self._engine = _engine
        self._batch = _batch
        self._row = _row
        self._n_kmers = _n_kmers
        self._offs = None
        self._lens = None
        self._bitmaps = None        # uint8[k_eff, L] device-computed bitmaps

    def _materialize_slices(self):
        if self._offs is None:
            offs = self._batch.host()[self._row, : self._n_kmers].astype(np.int64)
            starts = self._engine.set_starts_np
            # slice start -> dense set id (strictly increasing starts; the
            # miss sentinel start == P maps to the empty set row n_sets)
            ids = np.searchsorted(starts, offs, side="left")
            self._offs = offs
            self._lens = (starts[ids + 1] - starts[ids]).astype(np.int64)

    @property
    def offs(self) -> np.ndarray:
        self._materialize_slices()
        return self._offs

    @property
    def lens(self) -> np.ndarray:
        self._materialize_slices()
        return self._lens


class _BatchIds:
    """Shared handle to a batch's device-resident per-k-mer slice starts;
    pulled to host at most once, and only if some query needs position
    bitmaps (set ids are recovered host-side by searchsorted)."""

    def __init__(self, ids_dev):
        self._dev = ids_dev
        self._np = None

    def host(self) -> np.ndarray:
        if self._np is None:
            self._np = np.asarray(self._dev)
            self._dev = None
        return self._np


class PositionBitmapServing:
    """Position-bitmap lookups shared by the single-chip and sharded engines
    (both keep host-side `postings_np` / set-start views and attach device
    bitmaps to QueryCounts when the batch ran with positions=True)."""

    def position_bitmaps(
        self, qc: "QueryCounts", hit_rows: Sequence[int]
    ) -> Dict[int, List[bool]]:
        """Per-hit bitmaps over query k-mer positions (reference
        StoreMatchPositions, search.go:442-452) as plain bool lists."""
        return {
            k: v.tolist()
            for k, v in self.position_bitmaps_np(qc, hit_rows).items()
        }

    def position_bitmaps_np(
        self, qc: "QueryCounts", hit_rows: Sequence[int]
    ) -> Dict[int, np.ndarray]:
        """position_bitmaps as numpy bool arrays (the serving pipelines'
        form: translated search consumes one bitmap per hit per ORF, so
        per-element Python lists are too slow).  Served straight from the
        device-computed bit-packed bitmaps when the batch was dispatched
        with positions=True; otherwise via vectorized host binary search in
        the postings slices."""
        if qc._bitmaps is not None:
            idx = {int(r): j for j, r in enumerate(qc.hit_rows)}
            n = qc._n_kmers
            out = {
                int(h): qc._bitmaps[idx[int(h)], :n].astype(bool)
                for h in hit_rows
                if int(h) in idx
            }
            # requested rows outside the device top-k (callers today only
            # pass subsets of hit_rows, but the host path below answers
            # arbitrary rows -- keep both paths' contracts identical)
            rest = [h for h in hit_rows if int(h) not in idx]
            if rest:
                out.update(self._host_bitmaps_np(qc, rest))
            return out
        return self._host_bitmaps_np(qc, hit_rows)

    def _host_bitmaps_np(self, qc: "QueryCounts", hit_rows) -> Dict[int, np.ndarray]:
        from ..ops.count import member_np

        hits = np.asarray(list(hit_rows), dtype=np.uint32)
        if hits.size == 0 or qc.offs.size == 0:
            return {}
        found = member_np(self.postings_np, qc.offs, qc.lens, hits)
        return {int(h): found[j] for j, h in enumerate(hits)}


class SearchEngine(PositionBitmapServing):
    """Holds the device-resident index and runs batched searches."""

    def __init__(self, art: DBArtifact):
        if not art.indexed:
            raise ValueError("database is not indexed; run index_db first")
        import jax
        import jax.numpy as jnp

        self._jax = jax
        self.art = art

        # the cuckoo table carries each k-mer's (start, len) inline, so the
        # device probe needs no set-offsets indirection (ops/probe.py)
        self.table = jnp.asarray(np.asarray(art.hash_table))
        so = np.asarray(art.set_offsets)
        if so.size and int(so[-1]) >= 2**31:
            raise ValueError("postings larger than 2^31 need a sharded index")
        # +sentinel "empty set" row used for probe misses and padding lanes:
        # a miss reports start == P (== set_starts_np[n_sets]), len 0, and
        # np.searchsorted(set_starts_np, start) recovers the dense set id
        # (starts are strictly increasing; P maps to the sentinel n_sets)
        self.set_starts_np = np.concatenate([so, so[-1:]]).astype(np.int32)
        self.postings_np = np.asarray(art.postings)
        self.postings = jnp.asarray(self.postings_np)
        self.n_sets = int(so.size - 1)
        self.miss_start = int(so[-1]) if so.size else 0
        self.hash_log2 = art.hash_log2
        self._cap_hint = CAP_MIN

        self._fused = jax.jit(
            partial(
                _fused_impl,
                hash_log2=self.hash_log2,
                miss_start=self.miss_start,
            ),
            static_argnames=("cap", "k", "width", "positions"),
        )

    # ------------------------------------------------------------------
    # Core batched counting
    # ------------------------------------------------------------------

    def count_batch(
        self, seqs: Sequence[str], sizes: Sequence[int], k: int,
        positions: bool = False,
    ) -> List[QueryCounts]:
        """Count k-mer hits for a batch of equal-bucket queries.

        seqs: query sequences; sizes: SizeInKmer per query (kmers [0, size)
        are searched, which already excludes a trailing '*')."""
        return self.resolve_batch(self.dispatch_batch(seqs, sizes, k,
                                                      positions=positions))

    def dispatch_batch(self, seqs: Sequence[str], sizes: Sequence[int], k: int,
                       positions: bool = False, cap: int = 0,
                       adapt_hint: bool = True):
        """Asynchronously dispatch one batch to the device; returns a handle
        for resolve_batch.  JAX dispatch is async, so several batches can be
        in flight, overlapping upload/compute/fetch across batches (the
        analogue of the reference's pipelined worker pools).

        cap/adapt_hint are for warmup: a warmup batch pins its expansion
        capacity explicitly (so the intended shape bucket actually compiles)
        and must not feed its junk postings volume back into the adaptive
        hint that live traffic shares (adapt_hint=False)."""
        import jax.numpy as jnp

        B_real = len(seqs)
        if B_real == 0:
            return None
        # batch dimension rounds to a power of two (min 16): a tail batch of
        # arbitrary size would otherwise compile a fresh program (~30s over
        # the tunnel).  Padding rows have n_kmers=0 and never produce hits.
        B = _next_pow2(max(B_real, 16))
        if B != B_real:
            seqs = list(seqs) + [""] * (B - B_real)
        L = _next_pow2(max(max(sizes), 8))
        width = L + KMER_SIZE - 1
        n_kmers = np.zeros(B, dtype=np.int32)
        n_kmers[:B_real] = sizes

        # the host->device link is the throughput bottleneck: ship 7 residues
        # per uint32 (4.57 bits/residue) and unpack on device; the native
        # packer fuses padding + base-22 packing in one multithreaded pass
        from .. import native

        wire = native.pack_queries(seqs, width)
        if wire is None:
            wire = codec.pack_codes7(codec.pad_codes_batch(seqs, width))
        codes_dev = jnp.asarray(wire)
        n_dev = jnp.asarray(n_kmers)

        cap = cap or self._cap_hint
        k_eff = min(_next_pow2(max(k, TOPK_MIN)), cap)
        pos_dev = positions and _positions_on_device(cap, k_eff, L)
        outs = self._fused(
            self.table, self.postings,
            codes_dev, n_dev, cap=cap, k=k_eff, width=L + KMER_SIZE - 1,
            positions=pos_dev,
        )
        # start the device->host copies NOW so they overlap with later
        # dispatches; resolve_batch's device_get then finds them complete
        # (the link adds ~30ms RTT per blocking fetch otherwise)
        for arr in (outs[:3] + outs[4:]):
            arr.copy_to_host_async()
        return (outs, wire, list(sizes), k, cap, k_eff, L,
                positions, adapt_hint)

    # Sub-batch size for overflow re-runs.  Overflowing queries are re-run
    # in fixed chunks of RERUN_B at the cap THEY need, so peak device memory
    # is bounded by RERUN_B * CAP_MAX elements (~134 MB of uint32 rows)
    # instead of the whole batch's B * CAP_MAX (16 GB at B=2048 -- over
    # v5e HBM).  Fixed size also keeps the compiled-shape set small.
    RERUN_B = 16

    def resolve_batch(self, handle) -> List[QueryCounts]:
        """Block on a dispatched batch and finalize per-query results.

        Queries whose postings volume exceeded the batch's expansion cap are
        re-run selectively: `totals` is exact regardless of cap (phase 1
        computes it from the slice lengths), and results of queries with
        total <= cap are already exact, so only the overflowing rows are
        re-dispatched, in RERUN_B-sized sub-batches at their own cap bucket.
        Beyond CAP_MAX a query falls back to an unbounded host bincount."""
        if handle is None:
            return []
        (outs, wire, sizes, k, cap, k_eff, L, positions,
         adapt_hint) = handle
        counts, hit_rows, totals, ids = outs[:4]
        counts_h, hits_h, totals_h = self._jax.device_get(
            (counts, hit_rows, totals)
        )
        max_total = int(totals_h.max())
        bitmaps_h = None
        if len(outs) > 4:
            # uint8[B, k_eff, L//8] -> bool[B, k_eff, L]
            packed_bm = self._jax.device_get(outs[4])
            bitmaps_h = np.unpackbits(packed_bm, axis=-1, bitorder="little")
        # adapt the starting bucket toward observed volume, with 1/16 slack
        # so batches hovering at a bucket edge don't oscillate into re-runs
        # (warmup batches are excluded: their junk volume would reset a live
        # workload's adapted cap and force re-runs on the next real batch)
        if adapt_hint:
            self._cap_hint = _cap_bucket(max_total + (max_total >> 4))

        batch_ids = _BatchIds(ids)
        over_idx = [i for i in range(len(sizes)) if int(totals_h[i]) > cap]
        rerun = (
            self._rerun_overflow(wire, sizes, over_idx, totals_h, batch_ids,
                                 k, L, positions)
            if over_idx
            else {}
        )

        # top_k counts are descending, so nonzero entries form a prefix
        nnz = (counts_h > 0).sum(axis=1)
        out: List[QueryCounts] = []
        for i in range(len(sizes)):
            if i in rerun:
                qc = rerun[i]
            else:
                m = int(nnz[i])
                qc = QueryCounts(
                    hit_rows=hits_h[i][:m],
                    counts=counts_h[i][:m],
                    _engine=self,
                    _batch=batch_ids,
                    _row=i,
                    _n_kmers=sizes[i],
                )
                if bitmaps_h is not None:
                    qc._bitmaps = bitmaps_h[i]
            out.append(qc)
        return out

    def _rerun_overflow(
        self, wire: np.ndarray, sizes: Sequence[int], over_idx: List[int],
        totals_h: np.ndarray, batch_ids: "_BatchIds", k: int, L: int,
        positions: bool,
    ) -> Dict[int, QueryCounts]:
        """Re-run overflowing queries in RERUN_B-sized sub-batches, each at
        the cap bucket its chunk needs (queries are grouped by total so a
        chunk's cap fits its worst member)."""
        import jax.numpy as jnp

        out: Dict[int, QueryCounts] = {}
        k_full = _next_pow2(max(k, TOPK_MIN))
        dev_rows = []
        for i in over_idx:
            if int(totals_h[i]) > CAP_MAX:
                out[i] = self._count_host_row(batch_ids, i, sizes[i], k_full)
            else:
                dev_rows.append(i)
        dev_rows.sort(key=lambda i: int(totals_h[i]))
        for c0 in range(0, len(dev_rows), self.RERUN_B):
            chunk = dev_rows[c0 : c0 + self.RERUN_B]
            cap2 = _cap_bucket(max(int(totals_h[i]) for i in chunk))
            k2 = min(k_full, cap2)
            wire2 = np.zeros((self.RERUN_B,) + wire.shape[1:], wire.dtype)
            n2 = np.zeros(self.RERUN_B, dtype=np.int32)
            for j, i in enumerate(chunk):
                wire2[j] = wire[i]
                n2[j] = sizes[i]
            pos_dev = positions and _positions_on_device(cap2, k2, L)
            outs = self._fused(
                self.table, self.postings,
                jnp.asarray(wire2), jnp.asarray(n2),
                cap=cap2, k=k2, width=L + KMER_SIZE - 1, positions=pos_dev,
            )
            ch, hh = self._jax.device_get((outs[0], outs[1]))
            bm = None
            if len(outs) > 4:
                bm = np.unpackbits(self._jax.device_get(outs[4]), axis=-1,
                                   bitorder="little")
            for j, i in enumerate(chunk):
                m = int((ch[j] > 0).sum())
                qc = QueryCounts(
                    hit_rows=hh[j][:m], counts=ch[j][:m], _engine=self,
                    _batch=batch_ids, _row=i, _n_kmers=sizes[i],
                )
                if bm is not None:
                    qc._bitmaps = bm[j]
                out[i] = qc
        return out

    def _count_host_row(self, batch_ids: "_BatchIds", i: int, n_kmers: int, k: int) -> QueryCounts:
        """Unbounded host fallback (np.bincount) for postings-heavy queries."""
        offs = batch_ids.host()[i, :n_kmers].astype(np.int64)
        starts = self.set_starts_np
        ids = np.searchsorted(starts, offs, side="left")
        lens = (starts[ids + 1] - starts[ids]).astype(np.int64)
        segs = [
            self.postings_np[int(o) : int(o) + int(l)]
            for o, l in zip(offs, lens)
            if l > 0
        ]
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

    def warmup(self, batch_sizes=(16, 2048), lengths=(64, 128, 256, 512),
               positions=(False, True), caps=(CAP_MIN,)) -> None:
        """Pre-compile the common shape buckets: interactive (B=16) and the
        bulk pipeline's BATCH_MAX=2048, across the small expansion-cap grid.

        Remote compiles cost 20-60s each over a tunneled chip, so a server's
        first odd-shaped query would otherwise stall; run this (typically in
        a background thread at startup) to populate the in-process and
        persistent compile caches.  Warmup batches pin their cap and never
        touch the adaptive cap hint (adapt_hint=False), so a concurrent live
        workload's adaptation is unaffected.  Errors are ignored -- warmup
        is best effort."""
        for B in batch_sizes:
            for L in lengths:
                for pos in positions:
                    for capv in caps:
                        try:
                            seq = "A" * min(L + KMER_SIZE - 1, 64)
                            seqs = [seq] * B
                            sizes = [len(seq) - KMER_SIZE + 1] * (B - 1) + [L]
                            self.resolve_batch(self.dispatch_batch(
                                seqs, sizes, k=10, positions=pos,
                                cap=capv, adapt_hint=False))
                        except Exception:
                            pass

# ---------------------------------------------------------------------------
# jitted implementation
# ---------------------------------------------------------------------------


def _phase1_impl(table, codes, n_kmers, *, hash_log2, miss_start,
                 width: int = 0):
    """codes: int8/int32[B, L+6] residue codes, or (width>0) a packed wire
    format with width == L+6: uint32 from codec.pack_codes7 (the serving
    path) or uint16 from codec.pack_codes3 (dtype selects the decoder).

    The cuckoo probe resolves each k-mer's (start, len) postings slice in
    exactly two row-gathers (ops/probe.py); masked lanes and misses get
    (miss_start, 0)."""
    import jax
    import jax.numpy as jnp

    from ..ops.probe import probe_slices

    if width:
        if codes.dtype == jnp.uint32:
            codes = codec.unpack_codes7_jnp(codes, width)
        else:
            codes = codec.unpack_codes3_jnp(codes, width)
    L = codes.shape[1] - (KMER_SIZE - 1)
    codes = codes.astype(jnp.int32)
    kmers = jax.vmap(lambda c: codec.encode_kmers_jnp(c, L))(codes)
    starts, lens = probe_slices(table, kmers, hash_log2, miss_start)
    lane = jnp.arange(L, dtype=jnp.int32)[None, :]
    in_query = lane < n_kmers[:, None]
    offs = jnp.where(in_query, starts, jnp.uint32(miss_start)).astype(jnp.int32)
    lens = jnp.where(in_query, lens, 0).astype(jnp.int32)
    cum = jnp.cumsum(lens, axis=1).astype(jnp.int32)
    return offs, lens, cum


def _phase2_impl(postings, offs, cum, *, cap: int, k: int):
    from ..ops.count import count_topk, gather_postings

    total = cum[:, -1]
    rows, _, _ = gather_postings(postings, offs, cum, total, cap)
    counts, hit_rows = count_topk(rows, k)
    return counts, hit_rows


def _fused_impl(table, postings, codes, n_kmers, *,
                hash_log2, miss_start, cap, k, width=0,
                positions=False):
    """Single-dispatch search step: unpack + probe + expand + count + rank.

    Returns (counts int32[B,k], hit_rows uint32[B,k], totals int32[B],
    offs int32[B,L][, bitmaps uint8[B,k,L//8]]); offs (per-k-mer postings
    slice starts) are returned for lazy host-side position lookups.  With
    positions=True the per-hit k-mer position bitmaps (reference
    StoreMatchPositions, search.go:442-452) are computed on device from the
    expanded postings and shipped back bit-packed, avoiding a separate offs
    download + host search per batch.
    """
    import jax.numpy as jnp

    offs, lens, cum = _phase1_impl(
        table, codes, n_kmers,
        hash_log2=hash_log2, miss_start=miss_start, width=width,
    )
    if not positions:
        counts, hit_rows = _phase2_impl(postings, offs, cum, cap=cap, k=k)
        return counts, hit_rows, cum[:, -1], offs

    from ..ops.count import count_topk, gather_postings, member_bitmap_from_rows, pack_bits

    total = cum[:, -1]
    rows, seg, _ = gather_postings(postings, offs, cum, total, cap)
    counts, hit_rows = count_topk(rows, k)
    # gather-free MXU path over the already-expanded entries; the caller
    # (dispatch_batch) only requests device positions while the [B, cap, L]
    # and [B, cap, k] bf16 indicators stay bounded (_positions_on_device),
    # falling back to the lazy host bitmaps otherwise
    found = member_bitmap_from_rows(rows, seg, hit_rows, offs.shape[1])
    # rows with count 0 are sentinel padding; their bitmaps must be empty
    found = found & (counts[:, :, None] > 0)
    return counts, hit_rows, cum[:, -1], offs, pack_bits(found)
