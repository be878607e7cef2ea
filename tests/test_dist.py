"""Full search pipeline over the sharded multi-device engine must produce
byte-identical output to the single-chip engine."""

import numpy as np
import pytest

from kaamer_tpu.index.build import build_db
from kaamer_tpu.index.artifact import load_db
from kaamer_tpu.parallel.dist import ShardedSearchEngine, global_mesh
from kaamer_tpu.search.engine import SearchEngine
from kaamer_tpu.search.options import PROTEIN, SearchOptions
from kaamer_tpu.search.pipeline import run_search

AA = "ACDEFGHIKLMNPQRSTVWY"


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    rng = np.random.default_rng(17)
    tmp = tmp_path_factory.mktemp("distdb")
    fasta = tmp / "in.fasta"
    seqs = []
    with open(fasta, "w") as f:
        for i in range(50):
            L = int(rng.integers(50, 140))
            s = "".join(rng.choice(list(AA), size=L))
            seqs.append(s)
            f.write(f">D{i} dist test {i}\n{s}\n")
    dbdir = str(tmp / "db")
    build_db(dbdir, str(fasta), "fasta")
    return load_db(dbdir), seqs, tmp


def test_global_mesh_shape():
    mesh = global_mesh()
    assert set(mesh.axis_names) == {"dp", "shard"}
    assert mesh.size == 8  # conftest forces 8 virtual devices


def test_sharded_pipeline_matches_single(db, tmp_path):
    art, seqs, _ = db
    qf = tmp_path / "q.fasta"
    with open(qf, "w") as f:
        for i in (0, 7, 23, 41):
            f.write(f">q{i}\n{seqs[i]}\n")
        f.write(">mut\n" + seqs[3][:40] + "A" + seqs[3][41:] + "\n")

    opts = SearchOptions(File=str(qf), SequenceType=PROTEIN, OutFormat="tsv",
                         ExtractPositions=True, Annotations=True, MaxResults=3)

    single = b"".join(run_search(SearchEngine(art), opts))
    sharded_engine = ShardedSearchEngine(art, mesh=global_mesh(4))
    sharded = b"".join(run_search(sharded_engine, opts))
    assert single == sharded


def test_sharded_overflow_host_fallback(db, tmp_path):
    """Queries whose shard-local postings volume exceeds CAP_MAX must route
    through the exact host bincount and still match the single-chip engine."""
    art, seqs, _ = db
    queries = [seqs[2], seqs[9][:60], seqs[30]]
    sizes = [len(q) - 6 for q in queries]

    single = SearchEngine(art)
    want = single.count_batch(queries, sizes, k=8)

    eng = ShardedSearchEngine(art, mesh=global_mesh(4))
    eng.CAP_MAX = 2  # instance override: force every query to overflow
    eng._cap_hint = 2
    got = eng.count_batch(queries, sizes, k=8)

    for qw, qg in zip(want, got):
        assert np.array_equal(qw.hit_rows[:8], qg.hit_rows[:8])
        assert np.array_equal(qw.counts[:8], qg.counts[:8])


def test_encode_kmers_batch_matches_scalar():
    from kaamer_tpu import codec

    rng = np.random.default_rng(3)
    codes = rng.integers(-1, codec.N_AA, size=(5, 30)).astype(np.int32)
    batch = codec.encode_kmers_batch(codes)
    for i in range(codes.shape[0]):
        assert np.array_equal(batch[i], codec.encode_kmers(codes[i]))
