"""Pallas wavefront SW kernel vs the host DP (interpret mode on CPU)."""

import numpy as np
import pytest

from kaamer_tpu.ops import swalign
from kaamer_tpu.ops.matrices import LETTER_INDEX, get_matrix_scores
from kaamer_tpu.ops.swalign_pallas import align_pairs

AA = "ACDEFGHIKLMNPQRSTVWY"


def _host(q, r, scores):
    qa = LETTER_INDEX[np.frombuffer(q.encode(), np.uint8)]
    ra = LETTER_INDEX[np.frombuffer(r.encode(), np.uint8)]
    return swalign._smith_waterman(qa, ra, scores.sub_matrix,
                                   scores.gap_open, scores.gap_extend)


def test_kernel_matches_host_dp():
    rng = np.random.default_rng(3)
    scores = get_matrix_scores("blosum62", 11, 1)

    pairs = []
    for _ in range(6):
        base = "".join(rng.choice(list(AA), size=int(rng.integers(30, 90))))
        # related pair: mutate/delete a bit
        mutated = list(base)
        for _ in range(int(rng.integers(0, 6))):
            p = int(rng.integers(0, len(mutated)))
            mutated[p] = AA[int(rng.integers(0, 20))]
        if rng.random() < 0.5 and len(mutated) > 20:
            del mutated[5:9]
        pairs.append((base, "".join(mutated)))
    # one unrelated pair
    pairs.append((
        "".join(rng.choice(list(AA), size=40)),
        "".join(rng.choice(list(AA), size=55)),
    ))

    got = align_pairs(pairs, scores, interpret=True)
    for (q, r), (score, q_ops, r_ops) in zip(pairs, got):
        h_score, h_qops, h_rops = _host(q, r, scores)
        assert score == h_score, (q, r)
        if score > 0:
            # identical alignment path under identical tie-breaking
            assert q_ops == h_qops
            assert r_ops == h_rops


def test_kernel_perfect_self_alignment():
    scores = get_matrix_scores("blosum62", 11, 1)
    seq = "MELPNIMHPVAKLSTALAAALMLSGCMPGEIRPTIGQQME"
    ((score, q_ops, r_ops),) = align_pairs([(seq, seq)], scores, interpret=True)
    assert q_ops == list(range(len(seq)))
    assert r_ops == list(range(len(seq)))
    m62 = scores.sub_matrix
    want = sum(int(m62[LETTER_INDEX[ord(c)], LETTER_INDEX[ord(c)]]) for c in seq)
    assert score == want


def test_kernel_no_hit():
    scores = get_matrix_scores("blosum62", 11, 1)
    # force an all-negative substitution outcome: W vs P mismatches only
    ((score, q_ops, _),) = align_pairs([("WWWW", "PPPP")], scores, interpret=True)
    assert score == 0 and q_ops == []
