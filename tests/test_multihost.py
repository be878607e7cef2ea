"""Multi-HOST execution of the sharded search kernel: 2 OS processes, 4 CPU
devices each, jax.distributed coordinator on localhost (Gloo collectives).

The reference is single-host (SURVEY §2.3); this exercises the one BASELINE
config class with no single-process analogue: init_distributed's env-var
contract, global_mesh laying the dp axis ACROSS processes (shard stays on a
host's devices, dist.py:76-90), and a full all_to_all-merged search batch
whose per-process outputs must match the single-process reference."""

import os
import socket
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(__file__))

DRIVER = os.path.join(os.path.dirname(__file__), "mh_driver.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_batch_matches_single_process(tmp_path):
    port = _free_port()
    procs = []
    outs = []
    for pid in (0, 1):
        out = str(tmp_path / f"p{pid}.npz")
        outs.append(out)
        env = dict(
            os.environ,
            KAAMER_COORDINATOR=f"localhost:{port}",
            KAAMER_NUM_PROCESSES="2",
            KAAMER_PROCESS_ID=str(pid),
            PYTHONPATH=os.pathsep.join(sys.path[:2]),
        )
        # a fresh interpreter per process: the parent's jax is already
        # initialized single-process and cannot join a distributed job
        procs.append(subprocess.Popen(
            [sys.executable, DRIVER, out], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    fails = []
    for pid, p in enumerate(procs):
        try:
            stdout, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
            fails.append((pid, "timeout", stdout.decode()[-2000:]))
            continue
        if p.returncode != 0:
            fails.append((pid, p.returncode, stdout.decode()[-2000:]))
    assert not fails, fails

    # single-process reference on the parent's own 8 virtual devices
    from __graft_entry__ import _query_arrays, _synthetic_index
    from kaamer_tpu.parallel.dist import global_mesh
    from kaamer_tpu.parallel.mesh import (make_sharded_search,
                                          shard_index_arrays)

    ht, set_offsets, postings, seqs = _synthetic_index()
    sharded = shard_index_arrays(ht.table, set_offsets, postings, n_shards=4)
    B, L = 16, 64
    codes, n_kmers = _query_arrays(seqs, B, L)
    fn = make_sharded_search(global_mesh(4), sharded.hash_log2, cap=1024,
                             k=16)
    want_counts, want_hits, _ = (np.asarray(a) for a in fn(
        sharded.tables, sharded.postings, codes, n_kmers))
    assert (want_counts[:, 0] > 0).all()

    seen_rows = set()
    for out in outs:
        z = np.load(out)
        for start, c, h in zip(z["row_starts"], z["counts"], z["hit_rows"]):
            n = c.shape[0]
            np.testing.assert_array_equal(c, want_counts[start : start + n])
            np.testing.assert_array_equal(h, want_hits[start : start + n])
            seen_rows.update(range(start, start + n))
    assert seen_rows == set(range(B))  # both processes' halves covered
