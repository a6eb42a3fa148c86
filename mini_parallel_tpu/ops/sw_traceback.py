"""Smith-Waterman with traceback: batched CIGAR alignment.

Beyond the reference (which only ever produced a single int score), a usable
aligner must report *where* and *how* reads align — start/end coordinates and
a CIGAR string — which is also what downstream variant calling consumes.

TPU design: the batched anti-diagonal scan (ops/sw.py) additionally emits a
per-cell 2-bit **move code** for every diagonal (0=stop, 1=diag, 2=up/query-
gap, 3=left/ref-gap). The moves tensor (D, B, M) uint8 stays a device-side
scan output (HBM); the argmax cell per pair is tracked on-device as
(best, d*, i*). Traceback is an O(path length) host walk over the fetched
moves — the classic split: O(B·M·N) vectorized scoring on the accelerator,
O(B·(M+N)) pointer chasing on the host.

Conventions: ``a`` is the query (CIGAR I consumes query), ``b`` the
reference (D consumes reference), M consumes both. Local alignment: the walk
stops at the first stop-move (H floor), yielding soft-clippable start/end
coordinates. Tie-breaking priority diag > up > left everywhere (golden and
batched paths agree, so CIGARs match exactly in tests).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from mini_parallel_tpu.ops.encode import PAD_B
from mini_parallel_tpu.ops.sw import GAP_PENALTY, MATCH_SCORE, MISMATCH_PENALTY

STOP, DIAG, UP, LEFT = 0, 1, 2, 3


@dataclass
class Alignment:
    score: int
    # 0-based inclusive start, exclusive end, in query (a) / reference (b)
    query_start: int
    query_end: int
    ref_start: int
    ref_end: int
    cigar: str

    def cigar_ops(self) -> list[tuple[int, str]]:
        out, num = [], ""
        for ch in self.cigar:
            if ch.isdigit():
                num += ch
            else:
                out.append((int(num), ch))
                num = ""
        return out


def sw_align_numpy(a, b) -> Alignment:
    """Golden scoring + traceback (host-only, tests)."""
    if isinstance(a, str):
        a = a.encode("ascii")
    if isinstance(b, str):
        b = b.encode("ascii")
    a = np.frombuffer(bytes(a), np.uint8)
    b = np.frombuffer(bytes(b), np.uint8)
    m, n = len(a), len(b)
    H = np.zeros((m + 1, n + 1), np.int64)
    move = np.zeros((m + 1, n + 1), np.uint8)
    best, bi, bj = 0, 0, 0
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            s = MATCH_SCORE if a[i - 1] == b[j - 1] else MISMATCH_PENALTY
            diag = H[i - 1, j - 1] + s
            up = H[i - 1, j] + GAP_PENALTY
            left = H[i, j - 1] + GAP_PENALTY
            h = max(0, diag, up, left)
            H[i, j] = h
            if h == 0:
                move[i, j] = STOP
            elif h == diag:  # priority diag > up > left
                move[i, j] = DIAG
            elif h == up:
                move[i, j] = UP
            else:
                move[i, j] = LEFT
            if h > best:
                best, bi, bj = h, i, j
    # walk
    ops = []
    i, j = bi, bj
    while i > 0 and j > 0 and move[i, j] != STOP:
        mv = move[i, j]
        if mv == DIAG:
            ops.append("M")
            i, j = i - 1, j - 1
        elif mv == UP:
            ops.append("I")
            i -= 1
        else:
            ops.append("D")
            j -= 1
    return Alignment(
        score=int(best), query_start=i, query_end=bi, ref_start=j, ref_end=bj,
        cigar=_rle("".join(reversed(ops))),
    )


def _rle(ops: str) -> str:
    if not ops:
        return ""
    out = []
    cur, count = ops[0], 1
    for ch in ops[1:]:
        if ch == cur:
            count += 1
        else:
            out.append(f"{count}{cur}")
            cur, count = ch, 1
    out.append(f"{count}{cur}")
    return "".join(out)


@functools.partial(jax.jit)
def sw_moves_batch(seq_a: jnp.ndarray, seq_b: jnp.ndarray):
    """Batched scoring scan that also emits per-diagonal move codes.

    Returns (best (B,), best_d (B,), best_i (B,), moves (D, B, M) uint8).
    """
    B, M = seq_a.shape
    N = seq_b.shape[1]
    a = seq_a.astype(jnp.int32)
    bp = jnp.concatenate(
        [
            jnp.full((B, M - 1), PAD_B, jnp.int32),
            seq_b.astype(jnp.int32),
            jnp.full((B, M), PAD_B, jnp.int32),
        ],
        axis=1,
    )

    def shift_down(x):
        return jnp.concatenate([jnp.zeros((B, 1), jnp.int32), x[:, :-1]], axis=1)

    i_idx = jnp.arange(M, dtype=jnp.int32)[None, :]

    def step(carry, d):
        d1, d2, best, bd, bi = carry
        w = jax.lax.dynamic_slice_in_dim(bp, d, M, axis=1)[:, ::-1]
        s = jnp.where(a == w, MATCH_SCORE, MISMATCH_PENALTY)
        diag = shift_down(d2) + s
        up = shift_down(d1) + GAP_PENALTY
        left = d1 + GAP_PENALTY
        cand = jnp.maximum(jnp.maximum(diag, up), jnp.maximum(left, 0))
        move = jnp.where(
            cand <= 0,
            STOP,
            jnp.where(cand == diag, DIAG, jnp.where(cand == up, UP, LEFT)),
        ).astype(jnp.uint8)
        # cells outside the valid j range must not win the argmax
        j = d - i_idx
        valid = (j >= 0) & (j < N)
        cand_v = jnp.where(valid, cand, 0)
        row_best = jnp.max(cand_v, axis=1)
        row_arg = jnp.argmax(cand_v, axis=1).astype(jnp.int32)
        better = row_best > best
        best = jnp.where(better, row_best, best)
        bd = jnp.where(better, d, bd)
        bi = jnp.where(better, row_arg, bi)
        return (cand, d1, best, bd, bi), move

    z = a * 0
    zb = a[:, 0] * 0
    (d1, d2, best, bd, bi), moves = jax.lax.scan(
        step, (z, z, zb, zb, zb), jnp.arange(M + N - 1)
    )
    return best, bd, bi, moves


def traceback_host(
    best: np.ndarray, bd: np.ndarray, bi: np.ndarray, moves: np.ndarray
) -> list[Alignment]:
    """Walk the fetched move codes to CIGAR alignments (one per pair)."""
    out = []
    B = best.shape[0]
    for k in range(B):
        score = int(best[k])
        if score <= 0:
            out.append(Alignment(0, 0, 0, 0, 0, ""))
            continue
        d, i = int(bd[k]), int(bi[k])
        # matrix coords: query index qi = i (0-based cell), ref ji = d - i
        qi, ji = i, d - i
        ops = []
        while qi >= 0 and ji >= 0:
            mv = int(moves[qi + ji, k, qi])
            if mv == STOP:
                break
            if mv == DIAG:
                ops.append("M")
                qi -= 1
                ji -= 1
            elif mv == UP:
                ops.append("I")
                qi -= 1
            else:
                ops.append("D")
                ji -= 1
        out.append(
            Alignment(
                score=score,
                query_start=qi + 1,
                query_end=i + 1,
                ref_start=ji + 1,
                ref_end=d - i + 1,
                cigar=_rle("".join(reversed(ops))),
            )
        )
    return out


def sw_align_batch(seq_a: jnp.ndarray, seq_b: jnp.ndarray) -> list[Alignment]:
    """Batched local alignment with CIGARs (device scoring + host walk)."""
    best, bd, bi, moves = sw_moves_batch(seq_a, seq_b)
    return traceback_host(
        np.asarray(best), np.asarray(bd), np.asarray(bi), np.asarray(moves)
    )


@jax.jit
def sw_positions_batch(
    seq_a: jnp.ndarray, seq_b: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fully on-device traceback: per-base reference positions.

    Returns (score (B,), positions (B, M) int32) where positions[b, i] is the
    0-based index in seq_b that query base i aligns to under the best local
    alignment (M ops only), or -1 for unaligned/inserted/clipped bases —
    exactly what a pileup consumes. The (D, B, M) moves tensor stays in HBM;
    the walk is a lax.scan whose steps gather one move per read and scatter
    one position per read, so only (B,) + (B, M) scalars ever reach the host
    (the Python-walk path fetches the whole moves tensor: ~150x more D2H).

    Same move codes and tie-breaking as traceback_host, so positions match
    the host CIGAR application bit-for-bit (tested).
    """
    best, bd, bi, moves = sw_moves_batch(seq_a, seq_b)
    B, M = seq_a.shape
    N = seq_b.shape[1]
    rows = jnp.arange(B, dtype=jnp.int32)

    def step(carry, _):
        qi, ji, done, pos = carry
        d = qi + ji
        qc = jnp.clip(qi, 0, M - 1)
        dc = jnp.clip(d, 0, M + N - 2)
        mv = moves[dc, rows, qc]
        act = jnp.where(done | (qi < 0) | (ji < 0), STOP, mv.astype(jnp.int32))
        is_diag = act == DIAG
        pos = pos.at[rows, qc].set(
            jnp.where(is_diag, ji, pos[rows, qc])
        )
        qi = qi - is_diag.astype(jnp.int32) - (act == UP).astype(jnp.int32)
        ji = ji - is_diag.astype(jnp.int32) - (act == LEFT).astype(jnp.int32)
        done = done | (act == STOP)
        return (qi, ji, done, pos), None

    pos0 = jnp.full((B, M), -1, jnp.int32)
    carry0 = (bi, bd - bi, best <= 0, pos0)
    (_, _, _, pos), _ = jax.lax.scan(step, carry0, None, length=M + N - 1)
    return best, pos
