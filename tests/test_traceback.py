"""SW traceback/CIGAR: batched device path vs golden, plus re-scoring checks."""

import numpy as np
import jax.numpy as jnp
import pytest

from mini_parallel_tpu.ops import encode, sw
from mini_parallel_tpu.ops.sw_traceback import (
    Alignment,
    sw_align_batch,
    sw_align_numpy,
)
from tests.conftest import random_dna


def rescore(aln: Alignment, a: bytes, b: bytes) -> int:
    """Recompute the score implied by the CIGAR path — validates any
    tie-broken variant, not just the golden's choice."""
    qi, ji = aln.query_start, aln.ref_start
    score = 0
    for count, op in aln.cigar_ops():
        for _ in range(count):
            if op == "M":
                score += 2 if a[qi] == b[ji] else -1
                qi += 1
                ji += 1
            elif op == "I":
                score += -2
                qi += 1
            else:
                score += -2
                ji += 1
    assert qi == aln.query_end and ji == aln.ref_end
    return score


def _batchify(ra, rb, pad=64):
    A, _ = encode.pad_batch(ra, pad_to=pad, pad_value=int(encode.PAD_A))
    B, _ = encode.pad_batch(rb, pad_to=pad, pad_value=int(encode.PAD_B))
    return jnp.asarray(A), jnp.asarray(B)


def test_golden_simple_match():
    aln = sw_align_numpy("ACGT", "ACGT")
    assert aln.score == 8 and aln.cigar == "4M"
    assert (aln.query_start, aln.query_end) == (0, 4)


def test_golden_gap():
    # AAAATTTCCCC vs AAAACCCC: linear gap -2 each; best path 8M? golden DP
    aln = sw_align_numpy("AAAATTTCCCC", "AAAACCCC")
    assert aln.score == sw.sw_score_numpy("AAAATTTCCCC", "AAAACCCC")
    assert rescore(aln, b"AAAATTTCCCC", b"AAAACCCC") == aln.score


def test_batch_scores_and_cigars_match_golden(rng):
    ra = [random_dna(rng, int(rng.integers(5, 60))) for _ in range(20)]
    rb = [random_dna(rng, int(rng.integers(5, 60))) for _ in range(20)]
    A, B = _batchify(ra, rb)
    alns = sw_align_batch(A, B)
    for k, aln in enumerate(alns):
        gold = sw_align_numpy(ra[k], rb[k])
        assert aln.score == gold.score, k
        # NOTE: when several cells tie for the best score, the golden (row-
        # major) and batched (diagonal-major) argmaxes may pick different,
        # equally-optimal endpoints — so exact CIGAR equality is only
        # guaranteed when the endpoints agree. Every path must re-score to
        # the reported score regardless.
        if (aln.query_end, aln.ref_end) == (gold.query_end, gold.ref_end):
            assert aln.cigar == gold.cigar, k
            assert (aln.query_start, aln.ref_start) == (
                gold.query_start, gold.ref_start), k
        if aln.score > 0:
            assert rescore(aln, ra[k], rb[k]) == aln.score


def test_batch_with_indel_structure(rng):
    # reads derived from a template with an insertion: CIGAR must contain I/D
    t = random_dna(rng, 80)
    q = t[:40] + b"GGGG" + t[40:]  # 4-base insertion in the query
    A, B = _batchify([q], [t], pad=96)
    aln = sw_align_batch(A, B)[0]
    assert aln.score == sw.sw_score_numpy(q, t)
    assert "I" in aln.cigar
    assert rescore(aln, q, t) == aln.score


def test_no_alignment():
    A, B = _batchify([b"AAAA"], [b"TTTT"], pad=8)
    aln = sw_align_batch(A, B)[0]
    assert aln.score == 0 and aln.cigar == ""


def test_sw_positions_batch_matches_host_walk(rng):
    """Device traceback positions == host CIGAR application, incl. indels."""
    from mini_parallel_tpu.ops.sw_traceback import (
        sw_align_batch, sw_positions_batch)

    reads_a, reads_b = [], []
    for i in range(12):
        b = random_dna(rng, 60)
        a = bytearray(b[5:55])
        if i % 3 == 0:
            del a[20:23]  # deletion in query -> I/D structure
        if i % 3 == 1:
            a[10:10] = b"GGG"  # insertion
        if i % 4 == 0:
            a[5] = ord("T") if a[5] != ord("T") else ord("A")  # SNP
        reads_a.append(bytes(a))
        reads_b.append(b)
    arr_a, len_a = encode.pad_batch(reads_a, pad_to=64, pad_value=int(encode.PAD_A))
    arr_b, len_b = encode.pad_batch(reads_b, pad_to=64, pad_value=int(encode.PAD_B))
    a, b = jnp.asarray(arr_a), jnp.asarray(arr_b)

    score, pos = sw_positions_batch(a, b)
    score, pos = np.asarray(score), np.asarray(pos)
    alns = sw_align_batch(a, b)
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
        np.testing.assert_array_equal(pos[k], want, err_msg=f"read {k}")


def test_pallas_moves_matches_scan(rng):
    """sw_moves_batch_pallas (interpret) == sw_moves_batch: scores,
    argmax (bd, bi), and every valid move in the packed tensor."""
    import numpy as np

    from mini_parallel_tpu.ops.sw_traceback import (
        sw_moves_batch, sw_moves_batch_pallas)

    B, M, N = 16, 24, 40
    a = np.full((B, M), int(encode.PAD_A), np.uint8)
    b = np.full((B, N), int(encode.PAD_B), np.uint8)
    base = np.frombuffer(b"ACGT", np.uint8)
    for i in range(B):
        la = int(rng.integers(5, M)); lb = int(rng.integers(5, N))
        a[i, :la] = rng.choice(base, la)
        b[i, :lb] = rng.choice(base, lb)
    best0, bd0, bi0, mv0 = (np.asarray(x) for x in
                            sw_moves_batch(jnp.asarray(a), jnp.asarray(b)))
    best1, bd1, bi1, packed = (np.asarray(x) for x in sw_moves_batch_pallas(
        jnp.asarray(a), jnp.asarray(b), interpret=True))
    assert (best0 == best1).all()
    assert (bd0 == bd1).all() and (bi0 == bi1).all()
    D = mv0.shape[0]
    for d in range(D):
        slab = ((packed[d // 16].astype(np.uint32)
                 >> np.uint32(2 * (d % 16))) & 3)[:M, :B].T
        j = d - np.arange(M)[None, :]
        valid = (j >= 0) & (j < N)
        assert ((mv0[d] == slab) | ~valid).all(), d


def test_pallas_positions_matches_scan(rng):
    """sw_positions_batch_pallas == sw_positions_batch on gapped pairs."""
    import numpy as np

    from mini_parallel_tpu.ops.sw_traceback import (
        sw_positions_batch, sw_positions_batch_pallas)

    base = np.frombuffer(b"ACGT", np.uint8)
    for (B, M, N) in [(16, 24, 40), (5, 40, 24)]:
        a = np.full((B, M), int(encode.PAD_A), np.uint8)
        b = np.full((B, N), int(encode.PAD_B), np.uint8)
        for i in range(B):
            la = int(rng.integers(5, M)); lb = int(rng.integers(5, N))
            a[i, :la] = rng.choice(base, la)
            if rng.random() < 0.7:  # related pair -> real gapped walks
                mut = bytearray(a[i, :la].tobytes() * 2)[:lb]
                for _ in range(3):
                    p = int(rng.integers(0, max(1, len(mut))))
                    mut[p:p + 1] = b""
                seg = np.frombuffer(bytes(mut), np.uint8)[:lb]
                b[i, :len(seg)] = seg
            else:
                b[i, :lb] = rng.choice(base, lb)
        s0, p0 = (np.asarray(x) for x in
                  sw_positions_batch(jnp.asarray(a), jnp.asarray(b)))
        s1, p1 = (np.asarray(x) for x in
                  sw_positions_batch_pallas(jnp.asarray(a), jnp.asarray(b)))
        assert (s0 == s1).all() and (p0 == p1).all()


def test_pallas_walk_vmem_gate():
    """_best wrappers must route wide windows back to the scan path: the
    Pallas walk holds the whole packed moves block in VMEM (~16 MB/core)."""
    from mini_parallel_tpu.ops.sw_traceback import _pallas_walk_fits

    assert _pallas_walk_fits(152, 184, affine=False)   # variant-prep window
    assert _pallas_walk_fits(152, 184, affine=True)
    assert not _pallas_walk_fits(1024, 4096, affine=False)  # ~168 MB block
    assert not _pallas_walk_fits(1024, 4096, affine=True)
    # exact-f32 guard: huge-but-thin windows also fall back, never raise
    assert not _pallas_walk_fits(1 << 23, 1 << 23, affine=False)
