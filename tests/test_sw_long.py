"""Long-sequence column-strip SW (ops/sw_long.py) vs golden oracles.

The capability the reference errors out of (aligner.rs:436-456); scores
must be EXACT vs the quadratic golden at every geometry: single strip,
multiple strips, multiple row blocks, ragged edges, adversarial inputs.
Interpret mode (CPU) here; on-chip bit-parity runs in tools/kernel_check.
"""

import numpy as np
import pytest

from mini_parallel_tpu.ops.sw import sw_score_numpy
from mini_parallel_tpu.ops.sw_long import (sw_score_long,
                                           sw_score_numpy_blocked)
from tests.conftest import random_dna

# small tiles keep interpret-mode runtime sane; geometry invariance tests
# confirm results don't depend on (sb, blk)
SB, BLK = 8, 512  # strip width 1024, block 512


def _long(a, b, **kw):
    kw.setdefault("sb", SB)
    kw.setdefault("blk", BLK)
    return sw_score_long(a, b, interpret=True, **kw)


def test_blocked_golden_matches_quadratic(rng):
    for m, n in [(1, 1), (7, 13), (80, 64), (200, 150)]:
        a, b = random_dna(rng, m), random_dna(rng, n)
        assert sw_score_numpy_blocked(a, b) == sw_score_numpy(a, b)


@pytest.mark.parametrize(
    "m,n",
    [
        (30, 20),          # tiny: wavefront never fills the strip
        (200, 150),        # single strip, multiple 128-windows
        (600, 1500),       # multiple strips (width 1024)
        (1100, 2100),      # strips AND multiple row blocks (blk=512)
        (513, 1024),       # exact strip-width edge
        (512, 1025),       # one column past the strip edge
    ],
)
def test_exact_vs_golden(rng, m, n):
    a, b = random_dna(rng, m), random_dna(rng, n)
    assert _long(a, b) == sw_score_numpy_blocked(a, b)


def test_identical_strings_score_2n(rng):
    a = random_dna(rng, 3000)
    assert _long(a, a) == 2 * len(a)


def test_embedded_common_segment_crossing_strips(rng):
    # a strong alignment whose optimal path crosses a strip boundary —
    # exercises the carried boundary column
    a = np.frombuffer(random_dna(rng, 2500), np.uint8).copy()
    b = np.frombuffer(random_dna(rng, 2500), np.uint8).copy()
    seg = np.frombuffer(random_dna(rng, 400), np.uint8)
    a[700:1100] = seg
    b[900:1300] = seg  # spans columns 900-1300: crosses the 1024 boundary
    got = _long(bytes(a), bytes(b))
    assert got == sw_score_numpy_blocked(bytes(a), bytes(b))
    assert got >= 2 * 400 - 50  # sanity: the planted signal dominates


def test_geometry_invariance(rng):
    a, b = random_dna(rng, 900), random_dna(rng, 1700)
    want = sw_score_numpy_blocked(a, b)
    assert _long(a, b, sb=8, blk=512) == want
    assert _long(a, b, sb=8, blk=1024) == want
    assert _long(a, b, sb=16, blk=512) == want


def test_empty_inputs():
    assert _long(b"", b"ACGT") == 0
    assert _long(b"ACGT", b"") == 0


def test_score_strings_routes_long_pairs(rng, monkeypatch):
    """AlignmentEngine sw mode must route big pairs to the strip engine
    instead of raising/choking; scores stay exact."""
    from mini_parallel_tpu.models import alignment

    eng = alignment.AlignmentEngine(mode="sw")
    monkeypatch.setattr(eng, "LONG_PAIR_THRESHOLD", 1000)
    a, b = random_dna(rng, 1600), random_dna(rng, 1200)
    assert eng.score_strings(a, b) == sw_score_numpy_blocked(a, b)


class TestSharded:
    """Seq-axis halo-exchange pipeline on the virtual CPU mesh."""

    @pytest.fixture
    def mesh2(self):
        import jax
        from jax.sharding import Mesh

        if len(jax.devices()) < 2:
            pytest.skip("needs multi-device mesh")
        return Mesh(np.array(jax.devices()[:2]), ("seq",))

    def test_matches_golden_2chip(self, rng, mesh2):
        from mini_parallel_tpu.ops.sw_long import sw_score_long_sharded

        a, b = random_dna(rng, 2200), random_dna(rng, 2600)
        want = sw_score_numpy_blocked(a, b)
        got = sw_score_long_sharded(a, b, mesh2, sb=SB, blk=BLK,
                                    interpret=True)
        assert got == want

    def test_signal_crossing_band_and_strip(self, rng, mesh2):
        """Optimal path crosses BOTH a strip boundary (carried column) and
        a band boundary (halo state handoff)."""
        from mini_parallel_tpu.ops.sw_long import sw_score_long_sharded

        a = np.frombuffer(random_dna(rng, 3000), np.uint8).copy()
        b = np.frombuffer(random_dna(rng, 2200), np.uint8).copy()
        seg = np.frombuffer(random_dna(rng, 600), np.uint8)
        # band boundary for C=2/blk=512: T=4096, band=2048 -> plant across
        a[1700:2300] = seg
        b[800:1400] = seg  # crosses the 1024-column strip edge
        got = sw_score_long_sharded(bytes(a), bytes(b), mesh2, sb=SB,
                                    blk=BLK, interpret=True)
        assert got == sw_score_numpy_blocked(bytes(a), bytes(b))
        assert got >= 2 * 600 - 60

    def test_4chip_matches_2chip(self, rng):
        import jax
        from jax.sharding import Mesh

        from mini_parallel_tpu.ops.sw_long import sw_score_long_sharded

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        a, b = random_dna(rng, 2500), random_dna(rng, 1800)
        want = sw_score_numpy_blocked(a, b)
        for C in (2, 4):
            mesh = Mesh(np.array(jax.devices()[:C]), ("seq",))
            assert sw_score_long_sharded(a, b, mesh, sb=SB, blk=BLK,
                                         interpret=True) == want


def test_int32_fallback_matches_golden(rng, monkeypatch):
    """MPT_SW_LONG_F32=0 pins the int32 state path — the automatic
    fallback past the 2*min(M,N) < 2^24 f32-exactness bound; both paths
    must match the golden."""
    a, b = random_dna(rng, 900), random_dna(rng, 1700)
    want = sw_score_numpy_blocked(a, b)
    assert _long(a, b) == want  # f32 state (default at this size)
    monkeypatch.setenv("MPT_SW_LONG_F32", "0")
    assert _long(a, b) == want  # int32 state


def test_f32_guard_bound():
    from mini_parallel_tpu.ops.sw_long import _f32_ok

    assert _f32_ok(1 << 23, 1 << 30) is False  # 2*min = 2^24: not exact
    assert _f32_ok((1 << 23) - 1, 1 << 30) is True


def test_bad_unroll_rejected(rng):
    with pytest.raises(ValueError, match="unroll"):
        sw_score_long(b"ACGT" * 100, b"ACGT" * 100, sb=8, blk=512,
                      unroll=3, interpret=True)


class TestAffineLong:
    def test_exact_vs_goldens(self, rng):
        from mini_parallel_tpu.ops.sw import sw_affine_numpy
        from mini_parallel_tpu.ops.sw_long import (sw_affine_numpy_blocked,
                                                   sw_affine_score_long)

        for m, n in [(60, 40), (300, 700), (1100, 2100)]:
            a, b = random_dna(rng, m), random_dna(rng, n)
            got = sw_affine_score_long(a, b, sb=SB, blk=BLK, interpret=True)
            assert got == sw_affine_numpy_blocked(a, b)
            if m * n <= 300 * 700:
                assert got == sw_affine_numpy(a, b)

    def test_f_boundary_carries_across_strips(self, rng):
        """A long deletion whose F-state must survive a strip boundary:
        affine scores differ from linear exactly when the gap is long."""
        from mini_parallel_tpu.ops.sw_long import (sw_affine_numpy_blocked,
                                                   sw_affine_score_long)

        a = np.frombuffer(random_dna(rng, 2600), np.uint8).copy()
        b = np.frombuffer(random_dna(rng, 2600), np.uint8).copy()
        seg = np.frombuffer(random_dna(rng, 500), np.uint8)
        a[500:1000] = seg
        # b carries the segment split by a 40bp insertion right at the
        # 1024-column strip edge, so the affine gap run crosses strips
        ins = np.frombuffer(random_dna(rng, 40), np.uint8)
        bseg = np.concatenate([seg[:220], ins, seg[220:]])
        b[800:800 + bseg.size] = bseg
        got = sw_affine_score_long(bytes(a), bytes(b), sb=SB, blk=BLK,
                                   interpret=True)
        assert got == sw_affine_numpy_blocked(bytes(a), bytes(b))

    def test_routed_through_engine(self, rng, monkeypatch):
        from mini_parallel_tpu.models import alignment
        from mini_parallel_tpu.ops.sw_long import sw_affine_numpy_blocked

        eng = alignment.AlignmentEngine(mode="sw-affine")
        monkeypatch.setattr(eng, "LONG_PAIR_THRESHOLD", 1000)
        a, b = random_dna(rng, 1600), random_dna(rng, 1300)
        assert eng.score_strings(a, b) == sw_affine_numpy_blocked(a, b)

    def test_int32_fallback_matches_golden(self, rng, monkeypatch):
        from mini_parallel_tpu.ops.sw_long import (sw_affine_numpy_blocked,
                                                   sw_affine_score_long)

        a, b = random_dna(rng, 300), random_dna(rng, 700)
        want = sw_affine_numpy_blocked(a, b)
        assert sw_affine_score_long(a, b, sb=SB, blk=BLK,
                                    interpret=True) == want
        monkeypatch.setenv("MPT_SW_LONG_F32", "0")
        assert sw_affine_score_long(a, b, sb=SB, blk=BLK,
                                    interpret=True) == want


class TestAffineSharded:
    def test_matches_golden_with_boundary_crossing_gap(self, rng):
        import jax
        from jax.sharding import Mesh

        from mini_parallel_tpu.ops.sw_long import (
            sw_affine_numpy_blocked, sw_affine_score_long_sharded)

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        a = np.frombuffer(random_dna(rng, 2600), np.uint8).copy()
        b = np.frombuffer(random_dna(rng, 2600), np.uint8).copy()
        seg = np.frombuffer(random_dna(rng, 500), np.uint8)
        a[1700:2200] = seg  # crosses the C=2 band boundary (2048)
        ins = np.frombuffer(random_dna(rng, 30), np.uint8)
        bseg = np.concatenate([seg[:230], ins, seg[230:]])
        b[800:800 + bseg.size] = bseg  # affine gap crossing the strip edge
        want = sw_affine_numpy_blocked(bytes(a), bytes(b))
        for C in (2, 4):
            mesh = Mesh(np.array(jax.devices()[:C]), ("seq",))
            got = sw_affine_score_long_sharded(
                bytes(a), bytes(b), mesh, sb=SB, blk=BLK, interpret=True)
            assert got == want, (C, got, want)
