"""Batched device search engine.

The serving pipeline (replacing the per-k-mer LSM pointer chase of reference
search.go:414-440 with static-shaped device batches):

  host: read queries, bucket by length, pad residue codes to [B, L+K-1]
  dev : encode 7-mers -> hash probe -> postings CSR expand -> sort ->
        run-length encode -> top_k                        (phase1 + phase2)
  host: reference-exact filtering (FilterResults, search.go:189-220),
        position bitmaps, formatting.

Two jitted phases: phase 1 is shape-keyed on [B, L]; after it reports each
query's total postings volume, the host picks a power-of-two expansion
capacity and runs phase 2 keyed on [B, cap, k].  Queries whose postings
volume exceeds CAP_MAX fall back to a host bincount (unbounded, rare).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .. import codec
from ..index.artifact import DBArtifact
from ..records import Protein

KMER_SIZE = 7
CAP_MAX = 1 << 21
TOPK_MIN = 32


def _next_pow2(n: int) -> int:
    return 1 << max(0, int(np.ceil(np.log2(max(n, 1)))))


@dataclass
class QueryCounts:
    """Raw counting result for one query: top hits (dense rows) with their
    k-match counts, plus per-k-mer postings slices for position lookups."""

    hit_rows: np.ndarray    # uint32[k'] dense protein rows, count desc
    counts: np.ndarray      # int32[k']
    offs: np.ndarray        # int64[L] per-k-mer postings start
    lens: np.ndarray        # int64[L] per-k-mer postings length


class SearchEngine:
    """Holds the device-resident index and runs batched searches."""

    def __init__(self, art: DBArtifact, use_device: bool = True):
        if not art.indexed:
            raise ValueError("database is not indexed; run index_db first")
        import jax
        import jax.numpy as jnp

        self._jax = jax
        self._jnp = jnp
        self.art = art

        table = np.ascontiguousarray(np.asarray(art.hash_table))
        # little-endian view: column 0 = value (low 32), column 1 = key (high)
        self.table2 = jnp.asarray(table.view(np.uint32).reshape(-1, 2))
        so = np.asarray(art.set_offsets)
        if so.size and int(so[-1]) >= 2**31:
            raise ValueError("postings larger than 2^31 need a sharded index")
        # +sentinel "empty set" row used for probe misses and padding lanes
        self.set_starts_np = np.concatenate([so, so[-1:]]).astype(np.int32)
        self.set_starts = jnp.asarray(self.set_starts_np)
        self.postings_np = np.asarray(art.postings)
        self.postings = jnp.asarray(self.postings_np)
        self.n_sets = int(so.size - 1)
        self.log2 = art.hash_log2_size
        self.max_probe = art.hash_max_probe

        self._phase1 = jax.jit(
            partial(
                _phase1_impl,
                n_sets=self.n_sets,
                log2=self.log2,
                max_probe=self.max_probe,
            )
        )
        self._phase2 = jax.jit(_phase2_impl, static_argnames=("cap", "k"))

    # ------------------------------------------------------------------
    # Core batched counting
    # ------------------------------------------------------------------

    def count_batch(
        self, seqs: Sequence[str], sizes: Sequence[int], k: int
    ) -> List[QueryCounts]:
        """Count k-mer hits for a batch of equal-bucket queries.

        seqs: query sequences; sizes: SizeInKmer per query (kmers [0, size)
        are searched, which already excludes a trailing '*').
        """
        jnp = self._jnp
        B = len(seqs)
        if B == 0:
            return []
        L = _next_pow2(max(max(sizes), 8))
        codes = np.full((B, L + KMER_SIZE - 1), -1, dtype=np.int32)
        for i, s in enumerate(seqs):
            c = codec.seq_to_codes(s)[: L + KMER_SIZE - 1]
            codes[i, : c.shape[0]] = c
        n_kmers = np.asarray(sizes, dtype=np.int32)

        ids, offs, lens, cum = self._phase1(
            self.table2, self.set_starts, jnp.asarray(codes), jnp.asarray(n_kmers)
        )
        totals = np.asarray(cum[:, -1])
        offs_np = np.asarray(offs)
        lens_np = np.asarray(lens)

        cap = int(min(_next_pow2(max(int(totals.max()), 1)), CAP_MAX))
        overflow = totals > CAP_MAX
        k_eff = min(_next_pow2(max(k, TOPK_MIN)), cap)

        if not overflow.all():
            counts, hit_rows = self._phase2(
                self.postings, offs, cum, cap=cap, k=k_eff
            )
            counts = np.asarray(counts)
            hit_rows = np.asarray(hit_rows)

        out: List[QueryCounts] = []
        for i in range(B):
            Lq = sizes[i]
            if overflow[i]:
                qc = self._count_host(offs_np[i, :Lq], lens_np[i, :Lq], k_eff)
            else:
                c = counts[i]
                nz = c > 0
                qc = QueryCounts(
                    hit_rows=hit_rows[i][nz],
                    counts=c[nz],
                    offs=offs_np[i, :Lq].astype(np.int64),
                    lens=lens_np[i, :Lq].astype(np.int64),
                )
            out.append(qc)
        return out

    def _count_host(self, offs: np.ndarray, lens: np.ndarray, k: int) -> QueryCounts:
        """Unbounded host fallback (np.bincount) for postings-heavy queries."""
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
        return QueryCounts(
            hit_rows=hit_rows,
            counts=counts,
            offs=offs.astype(np.int64),
            lens=lens.astype(np.int64),
        )

    # ------------------------------------------------------------------
    # Position bitmaps
    # ------------------------------------------------------------------

    def position_bitmaps(
        self, qc: QueryCounts, hit_rows: Sequence[int]
    ) -> Dict[int, List[bool]]:
        """Per-hit bitmaps over query k-mer positions (reference
        StoreMatchPositions, search.go:442-452), via vectorized binary search
        in the postings slices."""
        from ..ops.count import member_np

        hits = np.asarray(list(hit_rows), dtype=np.uint32)
        if hits.size == 0 or qc.offs.size == 0:
            return {}
        found = member_np(self.postings_np, qc.offs, qc.lens, hits)
        return {int(h): found[j].tolist() for j, h in enumerate(hits)}


# ---------------------------------------------------------------------------
# jitted phase implementations (free functions so jax.jit caching works on
# engine re-instantiation)
# ---------------------------------------------------------------------------


def _phase1_impl(table2, set_starts, codes, n_kmers, *, n_sets, log2, max_probe):
    import jax
    import jax.numpy as jnp

    from ..ops.probe import probe

    L = codes.shape[1] - (KMER_SIZE - 1)
    kmers = jax.vmap(lambda c: codec.encode_kmers_jnp(c, L))(codes)
    ids = probe(table2, kmers, log2, max_probe, miss_value=np.uint32(n_sets))
    lane = jnp.arange(L, dtype=jnp.int32)[None, :]
    ids = jnp.where(lane < n_kmers[:, None], ids, jnp.uint32(n_sets))
    ids_i = ids.astype(jnp.int32)
    offs = jnp.take(set_starts, ids_i)
    lens = jnp.take(set_starts, ids_i + 1) - offs
    cum = jnp.cumsum(lens, axis=1).astype(jnp.int32)
    return ids, offs, lens, cum


def _phase2_impl(postings, offs, cum, *, cap: int, k: int):
    from ..ops.count import count_topk, gather_postings

    total = cum[:, -1]
    rows, _, _ = gather_postings(postings, offs, cum, total, cap)
    counts, hit_rows = count_topk(rows, k)
    return counts, hit_rows
