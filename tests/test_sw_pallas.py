"""Pallas SW kernel vs the pure-JAX scan and the NumPy golden (interpret mode
on CPU; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mini_parallel_tpu.ops import encode, sw
from mini_parallel_tpu.ops.sw_pallas import sw_score_batch_pallas
from tests.conftest import random_dna


def _batch(rng, B, max_a=80, max_b=60, pad_a=96, pad_b=64):
    ra = [random_dna(rng, int(rng.integers(1, max_a))) for _ in range(B)]
    rb = [random_dna(rng, int(rng.integers(1, max_b))) for _ in range(B)]
    arr_a, _ = encode.pad_batch(ra, pad_to=pad_a, pad_value=int(encode.PAD_A))
    arr_b, _ = encode.pad_batch(rb, pad_to=pad_b, pad_value=int(encode.PAD_B))
    return ra, rb, jnp.asarray(arr_a), jnp.asarray(arr_b)


def test_pallas_matches_golden_small(rng):
    ra, rb, a, b = _batch(rng, 8)
    got = np.asarray(sw_score_batch_pallas(a, b))
    for i in range(8):
        assert got[i] == sw.sw_score_numpy(ra[i], rb[i]), i


def test_pallas_matches_jax_scan(rng):
    ra, rb, a, b = _batch(rng, 32, max_a=150, max_b=150, pad_a=160, pad_b=160)
    got = np.asarray(sw_score_batch_pallas(a, b))
    ref = np.asarray(sw.sw_score_batch(a, b))
    assert (got == ref).all()


def test_pallas_identical_strings():
    arr, _ = encode.pad_batch([b"ACGT" * 20], pad_to=96, pad_value=int(encode.PAD_A))
    brr, _ = encode.pad_batch([b"ACGT" * 20], pad_to=96, pad_value=int(encode.PAD_B))
    assert int(sw_score_batch_pallas(jnp.asarray(arr), jnp.asarray(brr))[0]) == 160


def test_pallas_batch_padding_lanes(rng):
    # B not a multiple of the block: padded lanes must not pollute results
    ra, rb, a, b = _batch(rng, 3)
    got = np.asarray(sw_score_batch_pallas(a, b))
    assert got.shape == (3,)
    for i in range(3):
        assert got[i] == sw.sw_score_numpy(ra[i], rb[i])


def test_pallas_empty_and_disjoint():
    arr_a, _ = encode.pad_batch([b"", b"AAAA"], pad_to=16, pad_value=int(encode.PAD_A))
    arr_b, _ = encode.pad_batch([b"ACGT", b"TTTT"], pad_to=16, pad_value=int(encode.PAD_B))
    got = np.asarray(sw_score_batch_pallas(jnp.asarray(arr_a), jnp.asarray(arr_b)))
    assert got.tolist() == [0, 0]


# ---------------------------------------------------------------------------
# skewed-chain wavefront (K pairs per lane in stream coordinates)
# ---------------------------------------------------------------------------

def test_chained_matches_scan_square(rng):
    from mini_parallel_tpu.ops.sw_pallas import sw_score_batch_chained

    ra, rb, a, b = _batch(rng, 48, max_a=150, max_b=150, pad_a=152,
                          pad_b=152)
    got = np.asarray(sw_score_batch_chained(a, b, k_chain=4))
    ref = np.asarray(sw.sw_score_batch(a, b))
    assert (got == ref).all()


@pytest.mark.parametrize("k_chain", [1, 2, 3, 8])
def test_chained_matches_golden_geometries(rng, k_chain):
    """Ragged lengths, M != N, B not a multiple of k_chain*b_blk."""
    from mini_parallel_tpu.ops.sw_pallas import sw_score_batch_chained

    ra, rb, a, b = _batch(rng, 11, max_a=40, max_b=64, pad_a=40, pad_b=64)
    got = np.asarray(sw_score_batch_chained(a, b, k_chain=k_chain))
    for i in range(11):
        assert got[i] == sw.sw_score_numpy(ra[i], rb[i]), (i, k_chain)


def test_chained_empty_and_identical():
    from mini_parallel_tpu.ops.sw_pallas import sw_score_batch_chained

    arr_a, _ = encode.pad_batch([b"", b"ACGT" * 10],
                                pad_to=48, pad_value=int(encode.PAD_A))
    arr_b, _ = encode.pad_batch([b"ACGT", b"ACGT" * 10],
                                pad_to=48, pad_value=int(encode.PAD_B))
    got = np.asarray(sw_score_batch_chained(jnp.asarray(arr_a),
                                            jnp.asarray(arr_b), k_chain=2))
    assert got.tolist() == [0, 80]


@pytest.mark.parametrize("k_chain", [2, 8])
def test_affine_chained_matches_batch(rng, k_chain):
    from mini_parallel_tpu.ops.sw_pallas import sw_affine_batch_chained

    ra, rb, a, b = _batch(rng, 24, max_a=90, max_b=70, pad_a=96, pad_b=72)
    got = np.asarray(sw_affine_batch_chained(a, b, k_chain=k_chain))
    ref = np.asarray(sw.sw_affine_batch(a, b))
    assert (got == ref).all()


def test_affine_chained_gap_params(rng):
    from mini_parallel_tpu.ops.sw_pallas import sw_affine_batch_chained

    ra, rb, a, b = _batch(rng, 8, max_a=40, max_b=40, pad_a=40, pad_b=40)
    got = np.asarray(sw_affine_batch_chained(a, b, gap_open=-5,
                                             gap_extend=-2, k_chain=2))
    ref = np.asarray(sw.sw_affine_batch(a, b, gap_open=-5, gap_extend=-2))
    assert (got == ref).all()


def test_best_route_parity(rng):
    """sw_*_batch_best dispatch: identical results to the oracle on every
    backend (CPU lands on the scan path here; the TPU chain gate is covered
    by tools/kernel_check.py on-chip)."""
    from mini_parallel_tpu.ops.sw_pallas import (
        sw_affine_batch_best, sw_score_batch_best)

    ra, rb, a, b = _batch(rng, 8)
    lin = np.asarray(sw_score_batch_best(a, b))
    aff = np.asarray(sw_affine_batch_best(a, b, gap_open=-3, gap_extend=-1))
    for i in range(8):
        assert lin[i] == sw.sw_score_numpy(ra[i], rb[i]), i
        assert aff[i] == sw.sw_affine_numpy(
            ra[i], rb[i], gap_open=-3, gap_extend=-1), i


def test_chain_routable_gate():
    """Route gate: needs a full chain of pairs and square-ish geometry."""
    from mini_parallel_tpu.ops.sw_pallas import (
        CHAIN_B_BLK, CHAIN_K, _chain_routable)

    full = CHAIN_K * CHAIN_B_BLK
    assert _chain_routable(full, 150, 150, CHAIN_K)
    assert not _chain_routable(full - 1, 150, 150, CHAIN_K)  # under-filled
    assert not _chain_routable(full, 64, 256, CHAIN_K)  # too rectangular
