"""Batched Smith-Waterman as a Pallas TPU wavefront kernel.

The DP recurrence is scanned along anti-diagonals: every diagonal update is a
pure vector operation over the query axis (VPU lanes), the only sequential
dimension is the diagonal index.  One grid program aligns one (query, ref)
pair; the substitution scores arrive pre-skewed into diagonal layout so the
kernel never gathers.

Per pair the kernel emits:
  dirs uint8[D, W]  packed traceback decisions in diagonal layout
                    (bits 0-1: H origin 0=stop 1=diag 2=E 3=F;
                     bit 2: E continued from E; bit 3: F continued from F)
  best int32[2, W]  per-lane running best score and its diagonal
The host walks the packed directions to recover the alignment (a few hundred
scalar steps), keeping device->host traffic at ~(m+n)*m bytes per pair
instead of three full score matrices.

Scores/semantics match ops/swalign.py's host DP exactly (same gap model: a
run of g gap columns costs open + (g-1)*extend) and are differentially tested
against it.  On equal-scoring start cells the host picks the row-major-first
cell while per-lane tracking keeps the smallest j; either endpoint yields an
equal-scoring alignment.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import numpy as np

from .matrices import LETTER_INDEX, MatrixScores

NEG = -(10**8)


def _skew_sub(q: np.ndarray, r: np.ndarray, mat: np.ndarray,
              m_pad: int, d_pad: int) -> np.ndarray:
    """Diagonal-layout substitution scores: out[d, i] = sub[i-1, d-i-1] for
    cells (i, j=d-i) with 1<=i<=len(q), 1<=j<=len(r); 0 elsewhere."""
    m, n = len(q), len(r)
    sub = mat[q][:, r]  # [m, n]
    out = np.zeros((d_pad, m_pad + 1), dtype=np.int32)
    # cell (i, j) lives at out[i+j, i]
    ii, jj = np.meshgrid(np.arange(1, m + 1), np.arange(1, n + 1), indexing="ij")
    out[(ii + jj).ravel(), ii.ravel()] = sub.ravel()
    return out


def _kernel(qlen_ref, rlen_ref, subd_ref, dirs_ref, best_ref,
            *, m_pad: int, d_pad: int, gap_open: int, gap_extend: int):
    import jax
    import jax.numpy as jnp

    from jax.experimental import pallas as pl

    W = m_pad + 1
    b = 0  # leading block dim of tensor refs is 1 (one pair per grid program)
    pair = pl.program_id(0)
    qlen = qlen_ref[0, pair]
    rlen = rlen_ref[0, pair]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

    h_prev2 = jnp.zeros((1, W), dtype=jnp.int32)   # H on diag d-2
    h_prev = jnp.zeros((1, W), dtype=jnp.int32)    # H on diag d-1
    e_prev = jnp.full((1, W), NEG, dtype=jnp.int32)
    f_prev = jnp.full((1, W), NEG, dtype=jnp.int32)
    best_v = jnp.zeros((1, W), dtype=jnp.int32)
    best_d = jnp.zeros((1, W), dtype=jnp.int32)

    def shift1(x, fill):
        # lane i <- lane i-1; lane 0 <- fill
        rolled = jnp.roll(x, 1, axis=1)
        return jnp.where(lane == 0, fill, rolled)

    # Dynamic single-row VMEM stores must be tile-aligned on TPU, so the scan
    # processes 8 diagonals per block: reads/writes move [8, W] tiles at
    # 8-aligned offsets while the 8 inner steps are unrolled statically.
    def body(blk, state):
        h_prev2, h_prev, e_prev, f_prev, best_v, best_d = state
        d0 = pl.multiple_of(blk * 8, 8)
        sub_blk = subd_ref[b, pl.ds(d0, 8), :]  # [8, W] int32

        dir_rows = []
        for t in range(8):
            d = d0 + t
            valid = (
                (lane >= 1) & (lane <= qlen)
                & ((d - lane) >= 1) & ((d - lane) <= rlen)
            )

            e = jnp.maximum(h_prev - gap_open, e_prev - gap_extend)
            f = jnp.maximum(shift1(h_prev, 0) - gap_open,
                            shift1(f_prev, NEG) - gap_extend)
            h0 = shift1(h_prev2, 0) + sub_blk[t][None, :]
            h = jnp.maximum(jnp.maximum(0, h0), jnp.maximum(e, f))

            e = jnp.where(valid, e, NEG)
            f = jnp.where(valid, f, NEG)
            h = jnp.where(valid, h, 0)

            hdir = jnp.where(
                h == 0, 0,
                jnp.where(h == h0, 1, jnp.where(h == e, 2, 3)),
            )
            edir = (e != h_prev - gap_open).astype(jnp.int32)  # 1 = continued
            fdir = (f != shift1(h_prev, 0) - gap_open).astype(jnp.int32)
            dir_rows.append((hdir | (edir << 2) | (fdir << 3)).astype(jnp.uint8))

            better = h > best_v
            best_v = jnp.where(better, h, best_v)
            best_d = jnp.where(better, d, best_d)
            h_prev2, h_prev, e_prev, f_prev = h_prev, h, e, f

        dirs_ref[b, pl.ds(d0, 8), :] = jnp.concatenate(dir_rows, axis=0)
        return h_prev2, h_prev, e_prev, f_prev, best_v, best_d

    state = (h_prev2, h_prev, e_prev, f_prev, best_v, best_d)
    state = jax.lax.fori_loop(0, d_pad // 8, body, state)
    *_, best_v, best_d = state
    best_ref[b, 0, :] = best_v[0]
    best_ref[b, 1, :] = best_d[0]


_TB_CACHE = {}


def _build_call(B: int, m_pad: int, d_pad: int, gap_open: int,
                gap_extend: int, interpret: bool):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = m_pad + 1
    kernel = partial(_kernel, m_pad=m_pad, d_pad=d_pad,
                     gap_open=gap_open, gap_extend=gap_extend)

    call = pl.pallas_call(
        kernel,
        grid=(B,),  # one program per (query, ref) pair
        in_specs=[
            pl.BlockSpec((1, B), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, d_pad, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, d_pad, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, d_pad, W), np.uint8),
            jax.ShapeDtypeStruct((B, 2, W), np.int32),
        ],
        interpret=interpret,
    )
    return jax.jit(call)


_CALL_CACHE = {}


def _build_traceback(B: int, d_pad: int, W: int):
    """Device-side traceback: a lax.scan over at most 2*d_pad steps that
    walks the packed direction bytes for all B pairs in lockstep and emits
    per-step (q_op, r_op, emit) streams.  Keeps the [B, d_pad, W] dirs
    tensor on device -- only the op streams (a few hundred KB) come back,
    instead of the multi-MB dirs download the host walk needed.

    State machine identical to _traceback below (the host reference)."""
    import jax
    import jax.numpy as jnp

    S = 2 * d_pad  # every emit moves i or j; non-emit steps only enter E/F

    def traceback(dirs, best, qlens):
        lane = jnp.arange(W, dtype=jnp.int32)[None, :]
        bv = jnp.where(lane <= qlens[0][:, None], best[:, 0, :], -1)
        score = bv.max(axis=1)
        i0 = jnp.argmax(bv, axis=1).astype(jnp.int32)  # first max: lowest i
        d0 = jnp.take_along_axis(best[:, 1, :], i0[:, None], axis=1)[:, 0]
        j0 = (d0 - i0).astype(jnp.int32)
        dirs_flat = dirs.reshape(B, -1)

        H, E, F = 0, 1, 2

        def step(carry, _):
            i, j, st, done = carry
            alive = (~done) & (i > 0) & (j > 0)
            idx = (i + j) * W + i
            byte = jnp.take_along_axis(
                dirs_flat, idx[:, None].astype(jnp.int32), axis=1
            )[:, 0].astype(jnp.int32)
            hdir = byte & 3
            isH, isE, isF = st == H, st == E, st == F
            stopping = isH & (hdir == 0)
            emit = alive & ~stopping & ((isH & (hdir == 1)) | isE | isF)
            qv = jnp.where(isE, -1, i - 1).astype(jnp.int16)
            rv = jnp.where(isF, -1, j - 1).astype(jnp.int16)
            dec_i = alive & ((isH & (hdir == 1)) | isF)
            dec_j = alive & ((isH & (hdir == 1)) | isE)
            new_st = jnp.where(
                isH,
                jnp.where(hdir == 2, E, jnp.where(hdir == 3, F, H)),
                jnp.where(isE,
                          jnp.where(byte & 4, E, H),
                          jnp.where(byte & 8, F, H)),
            )
            new_done = done | stopping | (i <= 0) | (j <= 0)
            return (
                (jnp.where(dec_i, i - 1, i), jnp.where(dec_j, j - 1, j),
                 jnp.where(alive, new_st, st), new_done),
                (qv, rv, emit),
            )

        init = (i0, j0, jnp.zeros(B, jnp.int32), score <= 0)
        _, (q_steps, r_steps, emits) = jax.lax.scan(step, init, None, length=S)
        return score, q_steps, r_steps, emits

    return jax.jit(traceback)


def _build_full(B: int, m_pad: int, n_pad: int, d_pad: int, gap_open: int,
                gap_extend: int, interpret: bool):
    """Device pipeline: substitution scores via one-hot matmul on the MXU,
    skew to diagonal layout with a constant-index gather, then the Pallas
    wavefront kernel.  Only the residue codes travel host->device."""
    import jax
    import jax.numpy as jnp

    W = m_pad + 1
    call = _build_call(B, m_pad, d_pad, gap_open, gap_extend, interpret)

    # constant skew index/mask: subD[d, i] = sub[i-1, d-i-1]
    dd, ii = np.meshgrid(np.arange(d_pad), np.arange(W), indexing="ij")
    jj = dd - ii
    valid = (ii >= 1) & (ii <= m_pad) & (jj >= 1) & (jj <= n_pad)
    flat_idx = np.where(valid, (ii - 1) * n_pad + (jj - 1), 0).ravel()

    def full(qcodes, rcodes, qlens, rlens, mat):
        # scores are small ints: exact in f32 through the MXU
        mq = jnp.take(mat.astype(jnp.float32), qcodes, axis=0)  # [B, m, 24]
        ron = jax.nn.one_hot(rcodes, mat.shape[0], dtype=jnp.float32)
        sub = jnp.einsum("bmk,bnk->bmn", mq, ron,
                         preferred_element_type=jnp.float32)
        sub = sub.astype(jnp.int32).reshape(B, -1)
        subd = jnp.take(sub, flat_idx, axis=1).reshape(B, d_pad, W)
        subd = jnp.where(jnp.asarray(valid)[None], subd, 0)
        return call(qlens, rlens, subd)

    return jax.jit(full)


def sw_batch_device(
    qs: List[np.ndarray], rs: List[np.ndarray], scores: MatrixScores,
    interpret: bool = False,
) -> List[Tuple[int, list, list]]:
    """Align pairs of LETTER_INDEX arrays on device; returns per pair
    (best_score, q_ops, r_ops) like swalign._smith_waterman."""
    return sw_batch_resolve(sw_batch_dispatch(qs, rs, scores,
                                              interpret=interpret))


def sw_batch_dispatch(
    qs: List[np.ndarray], rs: List[np.ndarray], scores: MatrixScores,
    interpret: bool = False,
):
    """Asynchronously dispatch the device DP + traceback for a pair batch
    and start the device->host copies; sw_batch_resolve finishes.  Split so
    serving can keep collecting search results while a flushed alignment
    batch runs (JAX dispatch is async; the handle holds device arrays)."""
    import jax.numpy as jnp

    m_max = max(2, max(len(q) for q in qs))
    n_max = max(2, max(len(r) for r in rs))
    # round the lane axis to the fp32 tile (W = m_pad+1 multiple of 128) and
    # the diagonal axis to the 8-diagonal block size.  n_pad also rounds to
    # 128 so arbitrary reference lengths reuse a handful of compiled shapes
    # (each fresh shape costs a full remote kernel compile).
    m_pad = ((m_max + 1 + 127) // 128) * 128 - 1
    n_pad = ((n_max + 127) // 128) * 128
    d_pad = ((m_pad + n_pad + 1 + 7) // 8) * 8

    B_real = len(qs)
    # batch dimension buckets to powers of two (min 16): padded pairs have
    # zero lengths and cost nothing, while the compiled-shape count stays low
    B = max(16, 1 << int(np.ceil(np.log2(max(B_real, 1)))))
    qcodes = np.zeros((B, m_pad), dtype=np.int32)
    rcodes = np.zeros((B, n_pad), dtype=np.int32)
    qlens = np.zeros((1, B), dtype=np.int32)
    rlens = np.zeros((1, B), dtype=np.int32)
    for b, (q, r) in enumerate(zip(qs, rs)):
        qcodes[b, : len(q)] = q
        rcodes[b, : len(r)] = r
        qlens[0, b] = len(q)
        rlens[0, b] = len(r)

    key = (B, m_pad, n_pad, d_pad, scores.gap_open, scores.gap_extend,
           interpret)
    if key not in _CALL_CACHE:
        _CALL_CACHE[key] = _build_full(B, m_pad, n_pad, d_pad,
                                       scores.gap_open, scores.gap_extend,
                                       interpret)
    full = _CALL_CACHE[key]
    dirs, best = full(
        jnp.asarray(qcodes), jnp.asarray(rcodes),
        jnp.asarray(qlens), jnp.asarray(rlens),
        jnp.asarray(scores.sub_matrix),
    )

    W = m_pad + 1
    tkey = (B, d_pad, W)
    if tkey not in _TB_CACHE:
        _TB_CACHE[tkey] = _build_traceback(B, d_pad, W)
    score_d, q_steps_d, r_steps_d, emits_d = _TB_CACHE[tkey](
        dirs, best, jnp.asarray(qlens)
    )
    for arr in (score_d, q_steps_d, r_steps_d, emits_d):
        arr.copy_to_host_async()
    return (B_real, score_d, q_steps_d, r_steps_d, emits_d)


def sw_batch_resolve(handle) -> List[Tuple[int, list, list]]:
    """Finish a sw_batch_dispatch: fetch the op streams and decode them."""
    import jax

    B_real, score_d, q_steps_d, r_steps_d, emits_d = handle
    score, q_steps, r_steps, emits = jax.device_get(
        (score_d, q_steps_d, r_steps_d, emits_d)
    )

    out = []
    for b in range(B_real):
        s = int(score[b])
        if s <= 0:
            out.append((0, [], []))
            continue
        mask = emits[:, b]
        # steps run from the alignment end backwards; reverse for forward order
        q_ops = q_steps[mask, b][::-1].tolist()
        r_ops = r_steps[mask, b][::-1].tolist()
        out.append((s, q_ops, r_ops))
    return out


def _traceback(dirs: np.ndarray, best: np.ndarray, qlen: int):
    """Walk packed diagonal-layout directions from the best cell."""
    best_v = best[0, : qlen + 1]
    score = int(best_v.max())
    if score <= 0:
        return 0, [], []
    i = int(best_v.argmax())
    d = int(best[1, i])
    j = d - i

    q_ops: list = []
    r_ops: list = []
    state = "H"
    while i > 0 and j > 0:
        byte = int(dirs[i + j, i])
        if state == "H":
            hdir = byte & 3
            if hdir == 0:
                break
            if hdir == 1:
                q_ops.append(i - 1)
                r_ops.append(j - 1)
                i -= 1
                j -= 1
            elif hdir == 2:
                state = "E"
            else:
                state = "F"
        elif state == "E":
            q_ops.append(-1)
            r_ops.append(j - 1)
            if not (byte & 4):
                state = "H"
            j -= 1
        else:  # F
            q_ops.append(i - 1)
            r_ops.append(-1)
            if not (byte & 8):
                state = "H"
            i -= 1
    q_ops.reverse()
    r_ops.reverse()
    return score, q_ops, r_ops


def align_pairs(
    pairs: List[Tuple[str, str]], scores: MatrixScores, interpret: bool = False
):
    """String-level convenience wrapper (U->* handled by callers)."""
    qs = [LETTER_INDEX[np.frombuffer(q.encode("latin-1"), np.uint8)]
          for q, _ in pairs]
    rs = [LETTER_INDEX[np.frombuffer(r.encode("latin-1"), np.uint8)]
          for _, r in pairs]
    return sw_batch_device(qs, rs, scores, interpret=interpret)
