"""Affine-gap (Gotoh) traceback: batched scan + device walk vs golden DP."""

import numpy as np
import jax.numpy as jnp

from mini_parallel_tpu.ops import encode, sw
from mini_parallel_tpu.ops.sw_traceback import (
    sw_affine_align_batch,
    sw_affine_align_numpy,
    sw_affine_positions_batch,
)
from tests.conftest import random_dna


def _pad(reads_a, reads_b, pad=64):
    arr_a, _ = encode.pad_batch(reads_a, pad_to=pad, pad_value=int(encode.PAD_A))
    arr_b, _ = encode.pad_batch(reads_b, pad_to=pad, pad_value=int(encode.PAD_B))
    return jnp.asarray(arr_a), jnp.asarray(arr_b)


def _indel_pairs(rng, n=14):
    pairs = []
    for i in range(n):
        b = random_dna(rng, 56)
        a = bytearray(b[4:52])
        if i % 4 == 0:
            del a[20:24]  # 4bp deletion: affine strongly prefers ONE gap run
        if i % 4 == 1:
            a[12:12] = b"TTCGA"  # 5bp insertion
        if i % 4 == 2:
            a[8] = ord("T") if a[8] != ord("T") else ord("G")
            del a[30:32]
        pairs.append((bytes(a), b))
    pairs.append((b"", random_dna(rng, 30)))  # empty query
    pairs.append((random_dna(rng, 30), random_dna(rng, 30)))  # unrelated
    return pairs


def test_affine_cigar_matches_golden():
    # local rng: exact-CIGAR checks are alignment-shape sensitive
    rng = np.random.default_rng(555)
    pairs = _indel_pairs(rng)
    a, b = _pad([p[0] for p in pairs], [p[1] for p in pairs])
    alns = sw_affine_align_batch(a, b)
    for k, (qa, qb) in enumerate(pairs):
        want = sw_affine_align_numpy(qa, qb)
        got = alns[k]
        assert got.score == want.score, (k, got, want)
        # the device (diagonal-major) and golden (row-major) argmax can pick
        # different equally-optimal endpoints; the exact-CIGAR check only
        # applies when the tied endpoints agree
        if (got.query_end, got.ref_end) == (want.query_end, want.ref_end):
            assert got.cigar == want.cigar, (k, got.cigar, want.cigar)
            assert (got.query_start, got.ref_start) == (
                want.query_start, want.ref_start)


def test_affine_score_matches_scan_scorer():
    rng = np.random.default_rng(556)
    pairs = _indel_pairs(rng, n=10)
    a, b = _pad([p[0] for p in pairs], [p[1] for p in pairs])
    alns = sw_affine_align_batch(a, b)
    scores = np.asarray(sw.sw_affine_batch(a, b))
    assert [al.score for al in alns] == scores.tolist()


def test_affine_gap_run_is_one_event():
    """Under affine costs a 4bp deletion is one 4D run, not alternating ops."""
    rng = np.random.default_rng(557)
    b = random_dna(rng, 50)
    a = b[:20] + b[24:]  # clean 4bp deletion
    arr_a, arr_b = _pad([a], [b])
    aln = sw_affine_align_batch(arr_a, arr_b)[0]
    assert "4D" in aln.cigar
    assert aln.cigar.count("D") == 1


def test_affine_positions_match_host_walk():
    rng = np.random.default_rng(558)
    pairs = _indel_pairs(rng)
    a, b = _pad([p[0] for p in pairs], [p[1] for p in pairs])
    score, pos = sw_affine_positions_batch(a, b)
    score, pos = np.asarray(score), np.asarray(pos)
    alns = sw_affine_align_batch(a, b)
    for k, aln in enumerate(alns):
        want = np.full(64, -1, np.int32)
        if aln.score > 0:
            qi, rj = aln.query_start, aln.ref_start
            for count, op in aln.cigar_ops():
                if op == "M":
                    want[qi : qi + count] = np.arange(rj, rj + count)
                    qi += count
                    rj += count
                elif op == "I":
                    qi += count
                else:
                    rj += count
        assert score[k] == aln.score
        np.testing.assert_array_equal(pos[k], want, err_msg=f"pair {k}")


def test_affine_pallas_moves_match_scan():
    """sw_affine_moves_batch_pallas (interpret) == sw_affine_moves_batch:
    scores, argmax (bd, bi), and every valid 4-bit move in the packed
    tensor (h-src | eext<<2 | fext<<3)."""
    from mini_parallel_tpu.ops.sw_traceback import (
        PACK8, sw_affine_moves_batch, sw_affine_moves_batch_pallas)

    rng = np.random.default_rng(559)
    B, M, N = 16, 24, 40
    a = np.full((B, M), int(encode.PAD_A), np.uint8)
    b = np.full((B, N), int(encode.PAD_B), np.uint8)
    base = np.frombuffer(b"ACGT", np.uint8)
    for i in range(B):
        la = int(rng.integers(5, M)); lb = int(rng.integers(5, N))
        a[i, :la] = rng.choice(base, la)
        b[i, :lb] = rng.choice(base, lb)
    best0, bd0, bi0, mv0 = (np.asarray(x) for x in sw_affine_moves_batch(
        jnp.asarray(a), jnp.asarray(b)))
    best1, bd1, bi1, packed = (np.asarray(x) for x in
                               sw_affine_moves_batch_pallas(
                                   jnp.asarray(a), jnp.asarray(b),
                                   interpret=True))
    assert (best0 == best1).all()
    assert (bd0 == bd1).all() and (bi0 == bi1).all()
    D = M + N - 1
    for d in range(D):
        slab = ((packed[d // PACK8].astype(np.uint32)
                 >> np.uint32(4 * (d % PACK8))) & 15)[:M, :B].T
        j = d - np.arange(M)[None, :]
        valid = (j >= 0) & (j < N)
        assert ((mv0[d] == slab) | ~valid).all(), d


def test_affine_pallas_positions_match_scan():
    """sw_affine_positions_batch_pallas == sw_affine_positions_batch on
    indel-bearing pairs (the production gapped-affine traceback route)."""
    from mini_parallel_tpu.ops.sw_traceback import (
        sw_affine_positions_batch_pallas)

    rng = np.random.default_rng(560)
    pairs = _indel_pairs(rng)
    a, b = _pad([p[0] for p in pairs], [p[1] for p in pairs])
    s0, p0 = (np.asarray(x) for x in sw_affine_positions_batch(a, b))
    s1, p1 = (np.asarray(x) for x in sw_affine_positions_batch_pallas(a, b))
    assert (s0 == s1).all()
    np.testing.assert_array_equal(p0, p1)


def test_affine_pallas_positions_nondefault_gaps():
    """Parity holds for non-default (gap_open, gap_extend) too."""
    from mini_parallel_tpu.ops.sw_traceback import (
        sw_affine_positions_batch_pallas)

    rng = np.random.default_rng(561)
    pairs = _indel_pairs(rng, n=8)
    a, b = _pad([p[0] for p in pairs], [p[1] for p in pairs])
    s0, p0 = (np.asarray(x) for x in sw_affine_positions_batch(
        a, b, gap_open=-5, gap_extend=-2))
    s1, p1 = (np.asarray(x) for x in sw_affine_positions_batch_pallas(
        a, b, gap_open=-5, gap_extend=-2))
    assert (s0 == s1).all()
    np.testing.assert_array_equal(p0, p1)
