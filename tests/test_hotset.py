"""Hot-set dense counting path (ops/hotset.py + engine._p2h).

The engine-level exactness is covered by test_engine's heavy_db tests; this
file stresses the primitives: the hierarchical exact top-k (tie-breaks
included), hot-set selection, and a randomized differential fuzz of the
full engine on a skewed database against the dict oracle.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from oracle import OracleDB

from kaamer_tpu.index.artifact import load_db
from kaamer_tpu.index.build import build_db
from kaamer_tpu.ops import hotset
from kaamer_tpu.search.engine import SearchEngine

AA = list("ACDEFGHIKLMNPQRSTVWY")


def _np_topk(vals, k):
    """Reference (value desc, index asc) top-k."""
    order = np.argsort(-vals, axis=-1, kind="stable")[..., :k]
    return np.take_along_axis(vals, order, axis=-1), order


@pytest.mark.parametrize("P", [1024, 32768])  # direct and hierarchical
def test_topk_dense_matches_reference(P):
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    G, k = 8, 32
    # few distinct values => dense ties across and inside tiles
    vals = rng.integers(0, 6, size=(G, P)).astype(np.float32)
    v, i = hotset.topk_dense(jnp.asarray(vals), k)
    want_v, want_i = _np_topk(vals, k)
    np.testing.assert_array_equal(np.asarray(v), want_v)
    np.testing.assert_array_equal(np.asarray(i), want_i)


def test_topk_dense_tile_boundary_ties():
    """All top values equal and spread across many tiles: the selected
    tiles must be the lowest-indexed ones, giving row-ascending results."""
    import jax.numpy as jnp

    G, P, k = 2, 32768, 16
    vals = np.zeros((G, P), dtype=np.float32)
    pos = np.arange(0, P, 128) + 77          # one candidate per tile
    vals[:, pos] = 5.0
    v, i = hotset.topk_dense(jnp.asarray(vals), k)
    np.testing.assert_array_equal(np.asarray(v), np.full((G, k), 5.0))
    np.testing.assert_array_equal(np.asarray(i), np.tile(pos[:k], (G, 1)))


def test_select_hot_sets_threshold_and_budget():
    # sets of lengths 1..100: with h_max=10 the 10 longest are hot
    lens = np.arange(1, 101)
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.uint64)
    hot = hotset.select_hot_sets(offsets, num_proteins=200, h_max=10)
    hot_starts, thresh, P_pad = hot
    assert thresh == 91 and hot_starts.shape == (10,) and P_pad == 256
    # starts are sorted and correspond to the 10 longest sets
    assert list(hot_starts) == sorted(hot_starts)
    # none eligible => disabled
    assert hotset.select_hot_sets(
        np.arange(5, dtype=np.uint64), num_proteins=10) is None


def test_select_hot_sets_drops_tie_tier():
    """Regression (ADVICE r2): sets tied at the h_max cut must either all be
    hot or all stay cold -- argpartition used to keep an arbitrary subset,
    and phase 1 then zeroed the excluded ties out of the cold expansion
    without crediting them in M (silently wrong counts)."""
    # 12 sets of identical length with h_max=4: no pure length threshold can
    # select only 4, so the hot path must disable itself entirely
    lens = np.full(12, 30)
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.uint64)
    assert hotset.select_hot_sets(offsets, num_proteins=64, h_max=4) is None
    # a strictly-longer tier above the ties survives at the raised threshold
    lens2 = np.concatenate([np.full(3, 50), np.full(12, 30)])
    off2 = np.concatenate([[0], np.cumsum(lens2)]).astype(np.uint64)
    hot_starts, thresh, _ = hotset.select_hot_sets(off2, num_proteins=64,
                                                   h_max=4)
    assert hot_starts.shape == (3,) and thresh == 50


def test_select_hot_sets_stays_on_at_million_scale():
    """Regression: a hard P cutoff used to switch the dense path OFF beyond
    2^18 proteins -- the scale skew hurts most (51 q/s measured on the
    skewed 1M bench DB without it, 458 with it).  The budget must scale H
    down with P instead."""
    lens = np.linspace(24, 30000, num=3000).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.uint64)
    hot = hotset.select_hot_sets(offsets, num_proteins=1_000_000)
    assert hot is not None
    hot_starts, thresh, P_pad = hot
    assert P_pad == 1_000_064
    h_budget = hotset.M_BYTES_BUDGET // (P_pad * 2)
    assert 0 < hot_starts.shape[0] <= h_budget


def test_build_membership_device_scatter_matches_np():
    """The device-scatter membership build (init-time; avoids shipping a
    multi-GB M over the tunnel) must equal the host reference."""
    rng = np.random.default_rng(3)
    P_pad = 256
    lens = np.asarray([30, 25, 40, 24])
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.uint64)
    postings = np.concatenate([
        np.sort(rng.choice(200, size=l, replace=False)) for l in lens
    ]).astype(np.uint32)
    hot_starts = offsets[:-1].astype(np.int32)
    want = hotset.build_membership_np(postings, offsets, hot_starts, P_pad)
    got = np.asarray(hotset.build_membership(postings, offsets, hot_starts,
                                             P_pad))
    assert np.array_equal(want, got.astype(np.float32))


def test_hot_tie_tier_end_to_end(tmp_path, monkeypatch):
    """End-to-end ADVICE repro: a DB whose postings lengths tie exactly at
    the h_max cut returns oracle-exact counts (the tie tier is counted on
    the cold path; only the strictly-longer tier goes dense)."""
    rng = np.random.default_rng(3)
    long_doms = ["".join(rng.choice(AA, size=20)) for _ in range(3)]
    tie_doms = ["".join(rng.choice(AA, size=20)) for _ in range(12)]
    seqs = []
    for d in long_doms:
        for _ in range(50):
            seqs.append("".join(rng.choice(AA, size=8)) + d
                        + "".join(rng.choice(AA, size=8)))
    for d in tie_doms:
        for _ in range(30):
            seqs.append("".join(rng.choice(AA, size=8)) + d
                        + "".join(rng.choice(AA, size=8)))
    fasta = str(tmp_path / "in.fasta")
    with open(fasta, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">T{i:05d} tie\n{s}\n")
    dbdir = str(tmp_path / "db")
    build_db(dbdir, fasta, "fasta")
    art = load_db(dbdir)
    oracle = OracleDB([(int(art.protein_ids[i]), art.protein(i))
                       for i in range(art.num_proteins)])

    orig = hotset.select_hot_sets
    monkeypatch.setattr(
        hotset, "select_hot_sets",
        lambda so, num_p, **kw: orig(so, num_p, h_max=4))
    engine = SearchEngine(art)
    assert engine.hot_starts is not None  # the long tier survived

    queries = ([t + l for t, l in zip(tie_doms[:3], long_doms)]
               + [tie_doms[5] * 2, long_doms[0] * 2,
                  tie_doms[8] + tie_doms[9]])
    sizes = [len(q) - 6 for q in queries]
    ext = np.asarray(art.protein_ids)
    res = engine.count_batch(queries, sizes, k=10)
    for q, size, qc in zip(queries, sizes, res):
        got = [(int(ext[int(r)]), int(c))
               for r, c in zip(qc.hit_rows, qc.counts)]
        want, _ = oracle.kmer_search(q, size)
        assert got == want[: len(got)], q[:24]


@pytest.fixture(scope="module")
def skewed_db(tmp_path_factory):
    """Small power-law DB: popular domains shared by many proteins (hot
    sets), rare domains (cold sets), random linkers (tiny sets/misses)."""
    rng = np.random.default_rng(5)
    doms = ["".join(rng.choice(AA, size=int(rng.integers(14, 40))))
            for _ in range(24)]
    pop = 1.0 / (np.arange(24) + 2.0)
    pop /= pop.sum()
    seqs = []
    for i in range(500):
        parts = []
        for _ in range(int(rng.integers(1, 4))):
            parts.append("".join(rng.choice(AA, size=int(rng.integers(6, 18)))))
            parts.append(doms[int(rng.choice(24, p=pop))])
        parts.append("".join(rng.choice(AA, size=10)))
        seqs.append("".join(parts))
    tmp = tmp_path_factory.mktemp("skewed")
    fasta = str(tmp / "in.fasta")
    with open(fasta, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">S{i:05d} skew\n{s}\n")
    dbdir = str(tmp / "db")
    build_db(dbdir, fasta, "fasta")
    art = load_db(dbdir)
    oracle = OracleDB(
        [(int(art.protein_ids[i]), art.protein(i))
         for i in range(art.num_proteins)])
    return art, oracle, seqs, doms


def test_hot_engine_fuzz_vs_oracle(skewed_db):
    """Randomized mixed batch (hot-heavy, cold-only, mutated, pure-domain,
    miss-only queries) through the default engine is bit-identical to the
    oracle, with and without positions."""
    art, oracle, seqs, doms = skewed_db
    engine = SearchEngine(art)
    assert engine.hot_starts is not None

    rng = np.random.default_rng(11)
    queries = []
    for i in range(40):
        kind = i % 5
        if kind == 0:
            queries.append(seqs[int(rng.integers(0, len(seqs)))])
        elif kind == 1:
            s = list(seqs[int(rng.integers(0, len(seqs)))])
            for _ in range(4):
                s[int(rng.integers(0, len(s)))] = AA[int(rng.integers(0, 20))]
            queries.append("".join(s))
        elif kind == 2:
            queries.append(doms[int(rng.integers(0, 3))] * 2)   # pure hot
        elif kind == 3:
            queries.append("".join(rng.choice(AA, size=30)))    # mostly miss
        else:
            d = doms[int(rng.integers(0, len(doms)))]
            queries.append(d + "".join(rng.choice(AA, size=12)) + d)
    sizes = [len(q) - 6 for q in queries]

    ext = np.asarray(art.protein_ids)
    for positions in (False, True):
        res = engine.count_batch(queries, sizes, k=10, positions=positions)
        for q, size, qc in zip(queries, sizes, res):
            got = [(int(ext[int(r)]), int(c))
                   for r, c in zip(qc.hit_rows, qc.counts)]
            want, want_pos = oracle.kmer_search(q, size)
            assert got == want[: len(got)], q[:24]
            rows = [int(r) for r in qc.hit_rows[:4]]
            bms = engine.position_bitmaps(qc, rows)
            for r in rows:
                assert bms[r] == want_pos[int(ext[r])], q[:24]


def test_hot_matmul_exact_bf16_split():
    """hot_matmul must be integer-exact for bf16 M both below and above the
    256 weight bound (the >256 case uses the split-weight double matmul;
    values like 257 are NOT representable in bf16, so a naive cast would be
    wrong by 1)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    G, H, P = 8, 64, 384
    M_np = (rng.random((H, P)) < 0.3).astype(np.float32)
    for max_w in (256, 512):
        W_np = rng.integers(0, max_w + 1, size=(G, H)).astype(np.float32)
        # force odd values > 256 into the test when allowed
        if max_w > 256:
            W_np[0, 0] = 257.0
            W_np[1, 1] = 511.0
        ref = W_np @ M_np
        out = np.asarray(hotset.hot_matmul(
            jnp.asarray(W_np), jnp.asarray(M_np, dtype=jnp.bfloat16),
            max_w=max_w))
        np.testing.assert_array_equal(out, ref)
        # f32 M path unchanged
        out32 = np.asarray(hotset.hot_matmul(
            jnp.asarray(W_np), jnp.asarray(M_np), max_w=max_w))
        np.testing.assert_array_equal(out32, ref)


def _tam_oracle(counts_hot, rows, w, k):
    """Brute-force exact top-k of hot+cold totals with the (count desc,
    row asc) tie-break, from the pre-sort expansion multiset."""
    G, P = counts_hot.shape
    outc = np.zeros((G, k), np.int32)
    outr = np.full((G, k), 0xFFFFFFFF, np.uint32)
    for g in range(G):
        tot = counts_hot[g].astype(np.int64).copy()
        real = rows[g] != np.uint32(0xFFFFFFFF)
        np.add.at(tot, rows[g][real].astype(np.int64), w[g][real])
        nz = np.flatnonzero(tot)
        order = np.lexsort((nz, -tot[nz]))[:k]
        outc[g, : order.size] = tot[nz[order]]
        outr[g, : order.size] = nz[order].astype(np.uint32)
    return outc, outr


@pytest.mark.parametrize("pack_w_bits", [9])
def test_merge_tam_matches_bruteforce(pack_w_bits):
    """Randomized differential test of the threshold merge: certified rows
    must equal the brute-force totals exactly (counts AND rows); the
    fallback flag itself must be sound (uncertified rows are allowed, but
    every certified row is checked)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    G, P, cap, k = 16, 4096, 512, 16
    counts_hot = (rng.integers(0, 9, size=(G, P))
                  * (rng.random((G, P)) < 0.02)).astype(np.float32)
    rows = rng.integers(0, P, size=(G, cap)).astype(np.uint32)
    w = rng.integers(1, 6, size=(G, cap)).astype(np.int32)
    pad = rng.random((G, cap)) < 0.3
    rows[pad] = 0xFFFFFFFF
    w[pad] = 0
    c, h, ex = hotset.merge_hot_cold_tam(
        jnp.asarray(counts_hot), jnp.asarray(rows), jnp.asarray(w), k,
        pack_w_bits=pack_w_bits)
    c, h, ex = np.asarray(c), np.asarray(h), np.asarray(ex)
    wc, wh = _tam_oracle(counts_hot, rows, w, k)
    assert ex.sum() >= G - 2, "certificate should almost always hold here"
    np.testing.assert_array_equal(c[ex], wc[ex])
    np.testing.assert_array_equal(h[ex], wh[ex])


def test_merge_tam_certifies_uniform_plateau():
    """The common shared-domain case: every contending row has the SAME
    (cold, hot) split, the k-th boundary sits mid-plateau.  tau == bound
    here, but the plateau extension must certify it (C1/H2 pick the tier's
    lowest rows, so the result is exact) -- this is precisely the case
    that made the strict tau > bound certificate fall back on 23% of the
    skewed bench queries."""
    import jax.numpy as jnp

    G, P, k = 4, 8192, 16
    cap = 4 * hotset.CAND_K
    rows = np.tile(np.arange(cap, dtype=np.uint32), (G, 1))
    w = np.ones((G, cap), np.int32)
    counts_hot = np.zeros((G, P), np.float32)
    counts_hot[:, :cap] = 1.0
    c, h, ex = hotset.merge_hot_cold_tam(
        jnp.asarray(counts_hot), jnp.asarray(rows), jnp.asarray(w), k,
        pack_w_bits=9)
    assert np.asarray(ex).all()
    np.testing.assert_array_equal(np.asarray(c), np.full((G, k), 2))
    np.testing.assert_array_equal(np.asarray(h),
                                  np.tile(np.arange(k), (G, 1)))


def test_merge_tam_flags_uncertifiable_rows():
    """Disjoint flat cold and hot tiers wider than CAND_K: every total is
    1 but bound == 2, and no certificate clause applies -- the flag must
    come back False (the engine then re-runs on the host), never a
    silently wrong answer."""
    import jax.numpy as jnp

    G, P, k = 4, 8192, 16
    cap = 4 * hotset.CAND_K
    rows = np.tile(np.arange(cap, dtype=np.uint32), (G, 1))  # cold rows
    w = np.ones((G, cap), np.int32)
    counts_hot = np.zeros((G, P), np.float32)
    counts_hot[:, 4096 : 4096 + cap] = 1.0                   # hot rows
    c, h, ex = hotset.merge_hot_cold_tam(
        jnp.asarray(counts_hot), jnp.asarray(rows), jnp.asarray(w), k,
        pack_w_bits=9)
    assert not np.asarray(ex).any()


def test_merge_tam_unique_hit_rows():
    """C1/H2 overlap must be deduplicated: no row may appear twice in the
    final top-k."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    G, P, cap, k = 8, 2048, 256, 16
    # heavy overlap: hot mass concentrated on the same rows the cold
    # expansion hits
    hotrows = rng.integers(0, 64, size=(G, 8))
    counts_hot = np.zeros((G, P), np.float32)
    for g in range(G):
        counts_hot[g, hotrows[g]] = rng.integers(5, 50, size=8)
    rows = rng.integers(0, 64, size=(G, cap)).astype(np.uint32)
    w = np.ones((G, cap), np.int32)
    c, h, ex = hotset.merge_hot_cold_tam(
        jnp.asarray(counts_hot), jnp.asarray(rows), jnp.asarray(w), k,
        pack_w_bits=9)
    c, h = np.asarray(c), np.asarray(h)
    wc, wh = _tam_oracle(counts_hot, rows, w, k)
    for g in range(G):
        real = h[g][c[g] > 0]
        assert len(set(real.tolist())) == len(real)
    ex = np.asarray(ex)
    np.testing.assert_array_equal(c[ex], wc[ex])
    np.testing.assert_array_equal(h[ex], wh[ex])


def test_legacy_rerun_path_matches(skewed_db):
    """Force the TAM certificate to fail (tiny k_cold) so collect_batch
    re-runs rows through the legacy per-lane merge on device; results must
    equal the hot-disabled engine's exact output, including with min_top
    gating."""
    art, _oracle, _seqs, _doms = skewed_db
    eng = SearchEngine(art)
    eng._k_cold = 16  # starve the cold candidate list -> frequent flags
    ref = SearchEngine(art, hot=False)
    rng = np.random.default_rng(5)
    n = art.num_proteins
    queries = []
    for _ in range(64):
        row = int(rng.integers(0, n))
        seq = art.sequence(row)[:120]
        queries.append((seq * 3)[:120])
    sizes = [len(q) - 6 for q in queries]

    n_legacy = []
    orig = eng._dispatch_legacy
    eng._dispatch_legacy = (
        lambda ctx, fl: n_legacy.append(len(fl)) or orig(ctx, fl))
    res = eng.count_batch(queries, sizes, k=10)
    want = ref.count_batch(queries, sizes, k=10)
    assert sum(n_legacy) > 0, "test no longer exercises the rerun path"
    for a, b in zip(res, want):
        np.testing.assert_array_equal(a.hit_rows, b.hit_rows)
        np.testing.assert_array_equal(a.counts, b.counts)

    # min_top gating must use the re-run (exact) counts, not TAM's bounds
    h = eng.dispatch_batch(queries, sizes, k=10)
    gated = eng.resolve_batch(h, min_top=30)
    for g, b in zip(gated, want):
        if int(b.counts[0]) if len(b.counts) else 0 >= 30:
            assert g is not None
            np.testing.assert_array_equal(g.hit_rows, b.hit_rows)
        elif g is not None:
            assert int(g.counts[0]) >= 30
