"""Exact Smith-Waterman for LONG sequence pairs: full-height column strips.

The reference hard-caps a single alignment launch and errors beyond it
(smith_waterman/src/aligner.rs:436-456: min(16.7M work items, VRAM/3) then
"Sequence too large for GPU processing"). This module is the TPU answer the
blueprint calls for (SURVEY.md §5 long-context: "the DP grid is tiled and
boundary rows/columns are carried between tiles"): one pair of arbitrarily
long sequences scored EXACTLY, runtime-bound rather than memory-bound.

Design (differs from ops/sw_pallas.py, which batches many short pairs):

- The DP grid (M rows = seq_a, N cols = seq_b) is cut into **column strips**
  of width W = SB*128 spanning the FULL row range. Within a strip, vector
  element e = lane*SB + sublane (lane-major) owns **one fixed column**
  j0+e; at sweep step d it computes cell (i = d - e, j0 + e).
  Consequences, all wavefront-friendly:
    * UP neighbor (i-1, j) = same element, previous step — **no shift**;
    * LEFT (i, j-1) = element e-1, previous step — one shift;
    * DIAG (i-1, j-1) = element e-1, two steps back — the pre-shifted
      carry (d1s), exactly as in ops/sw_pallas.py.
- Because strips are full-height, the top boundary is the true DP edge
  (zeros) — only the **right boundary column** is carried between strips
  (rightcol[i] = H[i][j0+W-1]), produced as a kernel output and fed to the
  next strip as leftcol. The carried column enters at element 0, a FIXED
  position, via the shift-insert row — no moving-boundary masks (a masked
  variant measured +128% on v5e; see sw_pallas.py's negative results).
- Element shifts cross lanes every SB sublanes: shift-by-one = sublane
  concat + a (1,128) lane-roll of the last sublane row — the carry row.
- Per-step scalars (window base a[d] in, leftcol[d] in, corner H out) ride
  **rolling (1,128) rows** consumed/produced at fixed lanes, reloaded/
  flushed every 128 steps — no dynamic lane extraction (Mosaic-unfriendly).
- The grid axis streams row blocks of the a/leftcol inputs and the rightcol
  output through VMEM; DP state persists in scratch across the sequential
  TPU grid.

Zero ramp waste: all W cells of a step are useful once the wavefront fills
(ramp fraction W/(M+W) ~ 0 for long M), vs ~2x waste for the batched
M=N kernel — so this path's per-cell efficiency exceeds the headline
kernel's despite the extra carry-row ops.

Scoring: match +2 / mismatch -1 / gap -2, local alignment (floor 0) —
ops/sw.py semantics; validated against a blocked NumPy golden in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mini_parallel_tpu.ops.encode import PAD_A, PAD_B
from mini_parallel_tpu.ops.sw import GAP_PENALTY, MATCH_SCORE, MISMATCH_PENALTY

LANES = 128
# v5e sweep (500k x 400k, warm, int32 state): sb=64 -> 91 GCUPS, 128 ->
# 172, 256 -> 225, 512 -> 125; unroll 4 beat 2 and 8. f32 score state
# (r4, same window, interleaved 3/3): linear 257 vs 224, affine 179 vs
# 153 — the ops/sw_pallas.py float-first-VPU win transfers; int32 remains
# the automatic fallback past the 2^24 exactness bound (_f32_ok).
# Default 256 sublanes = 32768-column strips; sw_score_long narrows sb
# adaptively when b is shorter.
DEFAULT_SB = 256
DEFAULT_BLK = 16_384  # row-block (sweep steps) streamed per grid step
UNROLL = 4


def _strip_kernel(sb: int, blk: int, unroll: int, f32: bool = False):
    """Kernel for ONE strip: grid streams row blocks; scratch carries DP
    state across the sequential grid. Shapes: b strip (sb,128); per-block
    a rows (blk//128,128); leftcol rows (blk//128,128); outputs rightcol
    rows (blk//128,128) and running best (1,128).

    f32: score state (d1/d1s/best + boundary rows) in float32 — the same
    measured 1.27x VPU win as ops/sw_pallas.py:106-111 (the VPU is
    float-first); exact while |H| <= 2*min(M,N) < 2^24 (callers guard and
    fall back to int32). Base codes (b, w, aw_row) stay int32, and every
    HBM interface (lc/rc rows, wavefront state tiles, best) stays int32 so
    strip chaining and the sharded halo exchange are dtype-unchanged."""
    dt = jnp.float32 if f32 else jnp.int32
    # plain Python scalars (weak-typed): jnp.asarray here would be a
    # closure-captured traced constant, which pallas_call rejects
    cast = float if f32 else int
    match_s, mism_s, gap_s = (cast(v) for v in
                              (MATCH_SCORE, MISMATCH_PENALTY, GAP_PENALTY))

    def kernel(b_ref, a_ref, lc_ref, w0_ref, d10_ref, d1s0_ref,
               rc_ref, best_out, wt_ref, d1t_ref, d1st_ref,
               w, d1, d1s, best, aw_row, lc_row, rc_row):
        k = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        lane0 = lane == 0
        lane_last = lane == LANES - 1

        @pl.when(k == 0)
        def _init():
            # wavefront state enters as INPUT tiles so a sweep can resume
            # where another chip's band stopped (seq-axis halo exchange);
            # the single-chip path passes the cold-start state
            w[:] = w0_ref[:]
            d1[:] = d10_ref[:].astype(dt)
            d1s[:] = d1s0_ref[:].astype(dt)
            best[:] = jnp.zeros((sb, LANES), dt)

        b = b_ref[:]
        zeros = jnp.zeros((sb, LANES), dt)

        def one_diag(t, st):
            wv, d1v, d1sv, bestv, awv, lcv, rcv = st
            # element shift-by-one: sublane concat; the carry row crossing
            # into lane l comes from the previous lane's last sublane, and
            # lane 0 receives the injected boundary scalar (rolling rows
            # keep it at lane 0 — no dynamic extraction)
            w_carry = jnp.where(lane0, awv, pltpu.roll(wv[sb - 1:sb], 1, 1))
            wv = jnp.concatenate([w_carry, wv[:-1]], axis=0)
            s = jnp.where(wv == b, match_s, mism_s)
            diag = d1sv + s
            s_carry = jnp.where(lane0, lcv, pltpu.roll(d1v[sb - 1:sb], 1, 1))
            sh = jnp.concatenate([s_carry, d1v[:-1]], axis=0)
            # up = d1v (same element, previous step); left = sh
            ud = jnp.maximum(d1v, sh) + gap_s
            cand = jnp.maximum(jnp.maximum(diag, ud), zeros)
            bestv = jnp.maximum(bestv, cand)
            # harvest the strip's last column: corner cell sits at the
            # fixed last element; shift the collector left and insert at
            # the last lane (after 128 steps lane l holds step t-127+l)
            last_row = cand[sb - 1:sb]
            rcv = jnp.where(lane_last, last_row, pltpu.roll(rcv, LANES - 1, 1))
            # advance the rolling input rows (consumed at lane 0)
            awv = pltpu.roll(awv, LANES - 1, 1)
            lcv = pltpu.roll(lcv, LANES - 1, 1)
            return (wv, cand, sh, bestv, awv, lcv, rcv)

        def window(win, _):
            # one 128-step window: row I/O at the edges, branch-free core
            # (per-step pl.when in the hot loop measured pathologically slow)
            aw_row[:] = a_ref[pl.ds(win, 1), :]
            lc_row[:] = lc_ref[pl.ds(win, 1), :].astype(dt)

            def inner(q, _):
                st = (w[:], d1[:], d1s[:], best[:],
                      aw_row[:], lc_row[:], rc_row[:])
                for _u in range(unroll):
                    st = one_diag(0, st)
                w[:], d1[:], d1s[:], best[:] = st[:4]
                aw_row[:], lc_row[:], rc_row[:] = st[4:]
                return ()

            jax.lax.fori_loop(0, LANES // unroll, inner, ())
            rc_ref[pl.ds(win, 1), :] = rc_row[:].astype(jnp.int32)
            return ()

        jax.lax.fori_loop(0, blk // LANES, window, ())
        best_out[:] = jnp.max(best[:], axis=0,
                              keepdims=True).astype(jnp.int32)
        # final wavefront state (last grid step's values win) — the next
        # band's cold start
        wt_ref[:] = w[:]
        d1t_ref[:] = d1[:].astype(jnp.int32)
        d1st_ref[:] = d1s[:].astype(jnp.int32)

    return kernel


def cold_state(sb: int) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Wavefront state above the DP's first row: empty window, zero H."""
    return (jnp.full((sb, LANES), int(PAD_A), jnp.int32),
            jnp.zeros((sb, LANES), jnp.int32),
            jnp.zeros((sb, LANES), jnp.int32))


@functools.partial(
    jax.jit, static_argnames=("sb", "blk", "unroll", "interpret", "f32"))
def _run_strip(
    b_tile: jnp.ndarray,       # (sb, 128) int32, column codes of this strip
    a_rows: jnp.ndarray,       # (T//128, 128) int32, a codes row-major
    leftcol: jnp.ndarray,      # (T//128, 128) int32, carried boundary column
    sb: int, blk: int, unroll: int = UNROLL,
    interpret: bool | None = None,
    state: tuple | None = None,
    f32: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, tuple]:
    """Sweep one strip over T = a_rows.size steps starting from ``state``
    (cold_state if None). Returns (best (1,128), rightcol rows
    (T//128,128), final state) — the state threading is what lets a sweep
    split across row bands on a device mesh (halo exchange)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if LANES % unroll != 0 or blk % LANES != 0:
        # the window loop runs LANES // unroll iterations; a non-divisor
        # silently DROPS diagonal steps and desyncs the rolling-row I/O
        raise ValueError(
            f"unroll must divide {LANES} and blk must be a multiple of "
            f"{LANES} (got unroll={unroll}, blk={blk})"
        )
    if state is None:
        state = cold_state(sb)
    w0, d10, d1s0 = state
    rows_per_blk = blk // LANES
    nblk = a_rows.shape[0] // rows_per_blk
    state_spec = pl.BlockSpec((sb, LANES), lambda k: (0, 0),
                              memory_space=pltpu.VMEM)
    dt = jnp.float32 if f32 else jnp.int32
    rc, best, wt, d1t, d1st = pl.pallas_call(
        _strip_kernel(sb, blk, unroll, f32=f32),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((sb, LANES), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, LANES), lambda k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_blk, LANES), lambda k: (k, 0),
                         memory_space=pltpu.VMEM),
            state_spec, state_spec, state_spec,
        ],
        out_specs=[
            pl.BlockSpec((rows_per_blk, LANES), lambda k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            state_spec, state_spec, state_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct(a_rows.shape, jnp.int32),
            jax.ShapeDtypeStruct((1, LANES), jnp.int32),
            jax.ShapeDtypeStruct((sb, LANES), jnp.int32),
            jax.ShapeDtypeStruct((sb, LANES), jnp.int32),
            jax.ShapeDtypeStruct((sb, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((sb, LANES), jnp.int32),   # w (codes: always int32)
            pltpu.VMEM((sb, LANES), dt),          # d1
            pltpu.VMEM((sb, LANES), dt),          # d1s
            pltpu.VMEM((sb, LANES), dt),          # best
            pltpu.VMEM((1, LANES), jnp.int32),    # aw_row (codes)
            pltpu.VMEM((1, LANES), dt),           # lc_row
            pltpu.VMEM((1, LANES), dt),           # rc_row
        ],
        interpret=interpret,
    )(b_tile, a_rows, leftcol, w0, d10, d1s0)
    return best, rc, (wt, d1t, d1st)


def _f32_ok(M: int, N: int) -> bool:
    """True when f32 score state is exact for this pair: every H is an
    integer |H| <= 2*min(M,N), exact in f32 below 2^24 (an 8.3M-base
    minimum side — far beyond any chromosome pair we route here; past it
    the kernels silently fall back to the int32 state, never raise)."""
    import os

    return (2 * min(M, N) < (1 << 24)
            and os.environ.get("MPT_SW_LONG_F32", "1") != "0")


def sw_score_long(
    seq_a: bytes | np.ndarray,
    seq_b: bytes | np.ndarray,
    sb: int = DEFAULT_SB,
    blk: int = DEFAULT_BLK,
    unroll: int = UNROLL,
    interpret: bool | None = None,
    progress=None,
) -> int:
    """Exact linear-gap SW score of ONE long pair via column-strip sweeps.

    Capability anchor: the reference errors out above ~16.7M work items
    (aligner.rs:436-456); this path is bounded only by runtime (O(M*N)
    cells) and O(M + N) HBM for the carried boundary column — a >=100x cap
    lift. Memory: sequences as 1-byte codes + one (M,) int32 boundary.

    seq_a/seq_b: ASCII bytes or uint8 arrays. Returns int score.
    """
    a = np.frombuffer(seq_a, np.uint8) if isinstance(seq_a, (bytes, bytearray)) \
        else np.asarray(seq_a, np.uint8)
    b = np.frombuffer(seq_b, np.uint8) if isinstance(seq_b, (bytes, bytearray)) \
        else np.asarray(seq_b, np.uint8)
    M, N = a.size, b.size
    if M == 0 or N == 0:
        return 0
    # narrow the strip to the b length (padding a 32k-wide strip to score a
    # 9k b would waste ~70% of every sweep step)
    sb = max(8, min(sb, -(-(-(-N // LANES)) // 8) * 8))
    W = sb * LANES
    # sweep length: wavefront needs M + W - 1 steps; round to the block
    T = -(-(M + W) // blk) * blk
    a_pad = np.full(T, PAD_A, np.uint8)
    a_pad[:M] = a
    # lane-major element order within the strip: element e = l*sb + s owns
    # column j0 + e  ->  b tile layout [s, l] = b[j0 + l*sb + s]
    a_rows = jnp.asarray(a_pad.reshape(T // LANES, LANES).astype(np.int32))
    lc = jnp.zeros((T // LANES, LANES), jnp.int32)

    best_dev = jnp.zeros((), jnp.int32)
    n_strips = -(-N // W)
    for si in range(n_strips):
        j0 = si * W
        bt = np.full(W, PAD_B, np.uint8)
        seg = b[j0 : j0 + W]
        bt[: seg.size] = seg
        b_tile = jnp.asarray(
            bt.reshape(LANES, sb).T.astype(np.int32)
        )  # [s, l] = bt[l*sb + s]
        best, rc, _state = _run_strip(b_tile, a_rows, lc, sb, blk,
                                      unroll=unroll, interpret=interpret,
                                      f32=_f32_ok(M, N))
        # wavefront skew: the corner element emits H[d-(W-1)][j_last] at
        # step d, so rightcol row i sits at flat index i + W - 1; the next
        # strip consumes leftcol[d'] = H[d'][j_last] -> shift forward W-1
        lc = _shift_rows(rc, W - 1)
        best_dev = jnp.maximum(best_dev, jnp.max(best))
        if progress:
            progress(f"  sw-long strip {si + 1}/{n_strips} "
                     f"(cols {j0}-{min(j0 + W, N)})")
    return int(np.asarray(best_dev))


@functools.partial(jax.jit, static_argnames=("shift",))
def _shift_rows(rc: jnp.ndarray, shift: int) -> jnp.ndarray:
    """flat[i] = rc_flat[i + shift], zero-padded at the tail (row-major)."""
    flat = rc.reshape(-1)
    out = jnp.zeros_like(flat)
    out = out.at[: flat.size - shift].set(flat[shift:])
    return out.reshape(rc.shape)


def sw_score_numpy_blocked(seq_a: bytes, seq_b: bytes) -> int:
    """Vectorized NumPy anti-diagonal golden for sizes where the quadratic
    Python-loop oracle (ops/sw.py:sw_score_numpy) is too slow. O(M+N)
    memory, numpy-vector ops per diagonal."""
    a = np.frombuffer(seq_a, np.uint8).astype(np.int64)
    b = np.frombuffer(seq_b, np.uint8).astype(np.int64)
    M, N = a.size, b.size
    if M == 0 or N == 0:
        return 0
    # diagonal index d holds cells (i, d - i) for i in [max(0,d-N+1), min(d,M-1)]
    prev = np.zeros(M + 1, np.int64)   # H on diagonal d-1, indexed by i+1
    prev2 = np.zeros(M + 1, np.int64)  # H on diagonal d-2
    best = 0
    for d in range(M + N - 1):
        lo = max(0, d - N + 1)
        hi = min(d, M - 1)
        i = np.arange(lo, hi + 1)
        j = d - i
        s = np.where(a[i] == b[j], MATCH_SCORE, MISMATCH_PENALTY)
        diag = prev2[i] + s          # H[i-1][j-1]: prev2 index (i-1)+1
        up = prev[i]                 # H[i-1][j]:   prev index (i-1)+1
        left = prev[i + 1]           # H[i][j-1]:   prev index i+1
        h = np.maximum(
            np.maximum(diag, np.maximum(up, left) + GAP_PENALTY), 0
        )
        best = max(best, int(h.max()))
        prev2 = prev
        cur = np.zeros(M + 1, np.int64)
        cur[i + 1] = h
        prev = cur
    return best


# ---------------------------------------------------------------------------
# Multi-chip long-pair SW: the seq-axis halo-exchange pipeline the blueprint
# promises (SURVEY.md §5: "across chips via halo exchange on the sequence
# axis"). Rows split into one BAND per chip; for each strip, a chip resumes
# the sweep from the (w, d1, d1s) wavefront state its predecessor exported —
# that state IS the halo. Chips pipeline systolically: chip c sweeps strip
# k at stage k + c, so with C chips and K strips the wall is (K + C - 1)
# band-sweeps instead of K full sweeps (~C x for K >> C).
#
# The boundary-column subtlety: chip c's next-strip leftcol needs rightcol
# values for its band's last W-1 rows, which the wavefront skew places in
# the SUCCESSOR's sweep — mid-stage, too late to communicate. Instead each
# chip re-sweeps W-1 steps past its band (the a-row halo) and harvests the
# tail locally. The overlap's own leftcol input is garbage (zeros), but
# that only affects cells of rows >= the band end, and a harvested
# rightcol row i is computed before any row >= i+1 cell can influence it —
# so the tail is exact (duplicated work: (W-1)/band, ~0.3% at production
# sizes).
# ---------------------------------------------------------------------------


_SHARDED_STAGE_CACHE: dict = {}


def sw_score_long_sharded(
    seq_a: bytes | np.ndarray,
    seq_b: bytes | np.ndarray,
    mesh,
    axis: str = "seq",
    sb: int = DEFAULT_SB,
    blk: int = DEFAULT_BLK,
    unroll: int = UNROLL,
    interpret: bool | None = None,
    progress=None,
) -> int:
    """Exact long-pair SW on a device mesh: row bands x pipelined strips."""
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    a = np.frombuffer(seq_a, np.uint8) if isinstance(seq_a, (bytes, bytearray)) \
        else np.asarray(seq_a, np.uint8)
    b = np.frombuffer(seq_b, np.uint8) if isinstance(seq_b, (bytes, bytearray)) \
        else np.asarray(seq_b, np.uint8)
    M, N = a.size, b.size
    if M == 0 or N == 0:
        return 0
    C = int(mesh.shape[axis])
    sb = max(8, min(sb, -(-(-(-N // LANES)) // 8) * 8))
    W = sb * LANES
    K = -(-N // W)
    T = -(-(M + W) // (C * blk)) * (C * blk)
    band = T // C
    if band < W:
        raise ValueError(
            f"band ({band} rows) must cover one strip width ({W}); "
            f"use fewer chips, a smaller sb, or longer sequences"
        )
    Wp = -(-(W - 1) // LANES) * LANES  # overlap sweep rows (128-aligned)

    a_pad = np.full(T + Wp, PAD_A, np.uint8)  # + halo slack for the last chip
    a_pad[:M] = a
    a_bands = a_pad[:T].reshape(C, band // LANES, LANES).astype(np.int32)
    a_halo = np.stack([
        a_pad[(c + 1) * band : (c + 1) * band + Wp].reshape(
            Wp // LANES, LANES)
        for c in range(C)
    ]).astype(np.int32)

    shard = NamedSharding(mesh, P(axis))
    a_bands = jax.device_put(jnp.asarray(a_bands), shard)
    a_halo = jax.device_put(jnp.asarray(a_halo), shard)
    lc = jax.device_put(jnp.zeros((C, band // LANES, LANES), jnp.int32), shard)
    state = tuple(
        jax.device_put(jnp.zeros((C, sb, LANES), jnp.int32), shard)
        for _ in range(3)
    )
    best_run = jax.device_put(jnp.zeros((C, 1, LANES), jnp.int32), shard)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    f32 = _f32_ok(M, N)

    def stage_local(b_tile, a_band, a_hal, lc_in, w0, d10, d1s0, flags,
                    best_in):
        # locals carry a leading (1,) shard dim
        b_t = b_tile[0]
        first = flags[0, 0] != 0
        active = flags[0, 1] != 0
        # chip 0's band starts at the DP's true top edge -> cold for every
        # strip; other chips cold only before their first strip (inactive)
        chip = jax.lax.axis_index(axis)
        use_cold = (chip == 0) | ~active
        # derive cold tiles from operands (shard_map + fresh constants is a
        # varying-axis trap; see CLAUDE.md)
        cw = w0[0] * 0 + int(PAD_A)
        cz = w0[0] * 0
        w0_, d10_, d1s0_ = (
            jnp.where(use_cold, cw, w0[0]),
            jnp.where(use_cold, cz, d10[0]),
            jnp.where(use_cold, cz, d1s0[0]),
        )
        lc_eff = jnp.where(first, 0, lc_in[0])
        best1, rc1, st_t = _run_strip(
            b_t, a_band[0], lc_eff, sb, blk, unroll=unroll,
            interpret=interpret, state=(w0_, d10_, d1s0_), f32=f32)
        best2, rc2, _ = _run_strip(
            b_t, a_hal[0], a_hal[0] * 0, sb, Wp, unroll=unroll,
            interpret=interpret, state=st_t, f32=f32)
        lc_next = jnp.concatenate(
            [rc1.reshape(-1)[W - 1 :], rc2.reshape(-1)[: W - 1]]
        ).reshape(lc_in[0].shape)
        stage_best = jnp.maximum(jnp.max(best1), jnp.max(best2))
        best_out = jnp.maximum(best_in[0],
                               jnp.where(active, stage_best, 0))
        # halo exchange: this band's final state seeds the next band
        perm = [(i, i + 1) for i in range(C - 1)]
        nw, nd1, nd1s = (
            jax.lax.ppermute(s[None], axis, perm) for s in st_t
        )
        return (lc_next[None], nw, nd1, nd1s, best_out[None])

    spec = P(axis)
    # cache the jitted stage per geometry: a fresh jit(shard_map(closure))
    # per call would never hit jit's function-identity cache and pay a
    # remote compile (30-300s under tunnel load) on every invocation
    key = (mesh, axis, sb, blk, unroll, band, bool(interpret), f32)
    stage_fn = _SHARDED_STAGE_CACHE.get(key)
    if stage_fn is None:
        stage_fn = jax.jit(shard_map(
            stage_local, mesh=mesh,
            in_specs=(spec,) * 9, out_specs=(spec,) * 5,
            check_vma=False,
        ))
        _SHARDED_STAGE_CACHE[key] = stage_fn

    for s in range(K + C - 1):
        b_tiles = np.full((C, W), PAD_B, np.uint8)
        flags = np.zeros((C, 2), np.int32)
        for c in range(C):
            k = s - c
            if 0 <= k < K:
                seg = b[k * W : (k + 1) * W]
                b_tiles[c, : seg.size] = seg
                flags[c] = (1 if k == 0 else 0, 1)
        b_t = jax.device_put(
            jnp.asarray(
                b_tiles.reshape(C, LANES, sb).transpose(0, 2, 1)
                .astype(np.int32)
            ),
            shard,
        )
        fl = jax.device_put(jnp.asarray(flags), shard)
        lc, *st_and_best = stage_fn(b_t, a_bands, a_halo, lc, *state, fl,
                                    best_run)
        state = tuple(st_and_best[:3])
        best_run = st_and_best[3]
        if progress:
            progress(f"  sw-long-sharded stage {s + 1}/{K + C - 1}")
    return int(np.asarray(jnp.max(best_run)))


# ---------------------------------------------------------------------------
# Affine-gap (Gotoh) long-pair SW: same strip layout, two more carried
# matrices. In strip coordinates the affine states are natural fits:
#   E[i][j] = max(E[i-1][j], H[i-1][j] + go) + ge   (gap in b, consumes a)
#       -> up-neighbor = SAME element, previous step: no shift;
#   F[i][j] = max(F[i][j-1], H[i][j-1] + go) + ge   (gap in a, consumes b)
#       -> left-neighbor = shifted, and F CROSSES strip boundaries, so a
#          second boundary column (rightcol of F) is carried between strips
#          alongside H's.
# ---------------------------------------------------------------------------

from mini_parallel_tpu.ops.sw import GAP_EXTEND, GAP_OPEN  # noqa: E402

_NEG_LONG = -(2**24)  # decays by |ge| per step; > int32 min at any length


def _strip_kernel_affine(sb: int, blk: int, unroll: int,
                         gap_open: int, gap_extend: int,
                         f32: bool = False):
    # f32 score state: same 1.27x VPU win and int32 HBM interfaces as
    # _strip_kernel. Exactness: H/E/F are integers bounded by 2*min(M,N)
    # (< 2^24, caller-guarded) except the _NEG_LONG = -2^24 cold sentinel —
    # itself a power of two, f32-exact, and H >= 0 means max(sent, H+go)
    # discards it at the FIRST step, so no arithmetic ever lands on it.
    dt = jnp.float32 if f32 else jnp.int32
    # plain Python scalars — see _strip_kernel
    cast = float if f32 else int
    match_s, mism_s, go_s, ge_s = (cast(v) for v in
                                   (MATCH_SCORE, MISMATCH_PENALTY,
                                    gap_open, gap_extend))

    def kernel(b_ref, a_ref, lch_ref, lcf_ref,
               w0_ref, d10_ref, d1s0_ref, e10_ref, f10_ref,
               rch_ref, rcf_ref, best_out,
               wt_ref, d1t_ref, d1st_ref, e1t_ref, f1t_ref,
               w, d1, d1s, e1, f1, best,
               aw_row, lch_row, lcf_row, rch_row, rcf_row):
        k = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        lane0 = lane == 0
        lane_last = lane == LANES - 1

        @pl.when(k == 0)
        def _init():
            # state enters as inputs so a band can resume a predecessor's
            # sweep (seq-axis halo); single-chip passes cold_state_affine
            w[:] = w0_ref[:]
            d1[:] = d10_ref[:].astype(dt)
            d1s[:] = d1s0_ref[:].astype(dt)
            e1[:] = e10_ref[:].astype(dt)
            f1[:] = f10_ref[:].astype(dt)
            best[:] = jnp.zeros((sb, LANES), dt)

        b = b_ref[:]
        zeros = jnp.zeros((sb, LANES), dt)

        def one_diag(st):
            wv, d1v, d1sv, ev, fv, bestv, awv, lchv, lcfv, rchv, rcfv = st
            w_carry = jnp.where(lane0, awv, pltpu.roll(wv[sb - 1:sb], 1, 1))
            wv = jnp.concatenate([w_carry, wv[:-1]], axis=0)
            s = jnp.where(wv == b, match_s, mism_s)
            diag = d1sv + s
            # H left-shift (and its boundary injection)
            h_carry = jnp.where(lane0, lchv,
                                pltpu.roll(d1v[sb - 1:sb], 1, 1))
            sh = jnp.concatenate([h_carry, d1v[:-1]], axis=0)
            # F left-shift with its own carried boundary column
            f_carry = jnp.where(lane0, lcfv,
                                pltpu.roll(fv[sb - 1:sb], 1, 1))
            shf = jnp.concatenate([f_carry, fv[:-1]], axis=0)
            e = jnp.maximum(ev, d1v + go_s) + ge_s
            f = jnp.maximum(shf, sh + go_s) + ge_s
            cand = jnp.maximum(jnp.maximum(diag, jnp.maximum(e, f)), zeros)
            bestv = jnp.maximum(bestv, cand)
            rchv = jnp.where(lane_last, cand[sb - 1:sb],
                             pltpu.roll(rchv, LANES - 1, 1))
            rcfv = jnp.where(lane_last, f[sb - 1:sb],
                             pltpu.roll(rcfv, LANES - 1, 1))
            awv = pltpu.roll(awv, LANES - 1, 1)
            lchv = pltpu.roll(lchv, LANES - 1, 1)
            lcfv = pltpu.roll(lcfv, LANES - 1, 1)
            return (wv, cand, sh, e, f, bestv, awv, lchv, lcfv, rchv, rcfv)

        def window(win, _):
            aw_row[:] = a_ref[pl.ds(win, 1), :]
            lch_row[:] = lch_ref[pl.ds(win, 1), :].astype(dt)
            lcf_row[:] = lcf_ref[pl.ds(win, 1), :].astype(dt)

            def inner(q, _):
                st = (w[:], d1[:], d1s[:], e1[:], f1[:], best[:],
                      aw_row[:], lch_row[:], lcf_row[:],
                      rch_row[:], rcf_row[:])
                for _u in range(unroll):
                    st = one_diag(st)
                w[:], d1[:], d1s[:], e1[:], f1[:], best[:] = st[:6]
                aw_row[:], lch_row[:], lcf_row[:] = st[6:9]
                rch_row[:], rcf_row[:] = st[9:]
                return ()

            jax.lax.fori_loop(0, LANES // unroll, inner, ())
            rch_ref[pl.ds(win, 1), :] = rch_row[:].astype(jnp.int32)
            rcf_ref[pl.ds(win, 1), :] = rcf_row[:].astype(jnp.int32)
            return ()

        jax.lax.fori_loop(0, blk // LANES, window, ())
        best_out[:] = jnp.max(best[:], axis=0,
                              keepdims=True).astype(jnp.int32)
        wt_ref[:] = w[:]
        d1t_ref[:] = d1[:].astype(jnp.int32)
        d1st_ref[:] = d1s[:].astype(jnp.int32)
        e1t_ref[:] = e1[:].astype(jnp.int32)
        f1t_ref[:] = f1[:].astype(jnp.int32)

    return kernel


def cold_state_affine(sb: int):
    """Affine wavefront state above the DP's first row."""
    neg = jnp.full((sb, LANES), _NEG_LONG, jnp.int32)
    return (jnp.full((sb, LANES), int(PAD_A), jnp.int32),
            jnp.zeros((sb, LANES), jnp.int32),
            jnp.zeros((sb, LANES), jnp.int32),
            neg, neg.copy())


@functools.partial(jax.jit, static_argnames=(
    "sb", "blk", "unroll", "gap_open", "gap_extend", "interpret", "f32"))
def _run_strip_affine(b_tile, a_rows, lch, lcf, sb, blk,
                      gap_open: int, gap_extend: int,
                      unroll: int = UNROLL, interpret: bool | None = None,
                      state: tuple | None = None, f32: bool = False):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if LANES % unroll != 0 or blk % LANES != 0:
        raise ValueError(
            f"unroll must divide {LANES} and blk must be a multiple of "
            f"{LANES} (got unroll={unroll}, blk={blk})"
        )
    if state is None:
        state = cold_state_affine(sb)
    rows_per_blk = blk // LANES
    nblk = a_rows.shape[0] // rows_per_blk
    row_spec = pl.BlockSpec((rows_per_blk, LANES), lambda k: (k, 0),
                            memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((sb, LANES), lambda k: (0, 0),
                              memory_space=pltpu.VMEM)
    dt = jnp.float32 if f32 else jnp.int32
    out = pl.pallas_call(
        _strip_kernel_affine(sb, blk, unroll, gap_open, gap_extend,
                             f32=f32),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((sb, LANES), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec,
        ] + [state_spec] * 5,
        out_specs=[
            row_spec, row_spec,
            pl.BlockSpec((1, LANES), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [state_spec] * 5,
        out_shape=[
            jax.ShapeDtypeStruct(a_rows.shape, jnp.int32),
            jax.ShapeDtypeStruct(a_rows.shape, jnp.int32),
            jax.ShapeDtypeStruct((1, LANES), jnp.int32),
        ] + [jax.ShapeDtypeStruct((sb, LANES), jnp.int32)
             for _ in range(5)],
        scratch_shapes=[pltpu.VMEM((sb, LANES), jnp.int32)]  # w (codes)
        + [pltpu.VMEM((sb, LANES), dt) for _ in range(5)]    # d1,d1s,e1,f1,best
        + [pltpu.VMEM((1, LANES), jnp.int32)]                # aw_row (codes)
        + [pltpu.VMEM((1, LANES), dt) for _ in range(4)],    # lch,lcf,rch,rcf

        interpret=interpret,
    )(b_tile, a_rows, lch, lcf, *state)
    rch, rcf, best = out[0], out[1], out[2]
    return best, rch, rcf, tuple(out[3:])


def sw_affine_score_long(
    seq_a: bytes | np.ndarray,
    seq_b: bytes | np.ndarray,
    gap_open: int = GAP_OPEN,
    gap_extend: int = GAP_EXTEND,
    sb: int = DEFAULT_SB,
    blk: int = DEFAULT_BLK,
    unroll: int = UNROLL,
    interpret: bool | None = None,
    progress=None,
) -> int:
    """Exact affine-gap (Gotoh) SW for ONE long pair via column strips —
    the affine analogue of sw_score_long; carries BOTH the H and F
    boundary columns between strips."""
    a = np.frombuffer(seq_a, np.uint8) if isinstance(seq_a, (bytes, bytearray)) \
        else np.asarray(seq_a, np.uint8)
    b = np.frombuffer(seq_b, np.uint8) if isinstance(seq_b, (bytes, bytearray)) \
        else np.asarray(seq_b, np.uint8)
    M, N = a.size, b.size
    if M == 0 or N == 0:
        return 0
    sb = max(8, min(sb, -(-(-(-N // LANES)) // 8) * 8))
    W = sb * LANES
    T = -(-(M + W) // blk) * blk
    a_pad = np.full(T, PAD_A, np.uint8)
    a_pad[:M] = a
    a_rows = jnp.asarray(a_pad.reshape(T // LANES, LANES).astype(np.int32))
    lch = jnp.zeros((T // LANES, LANES), jnp.int32)
    lcf = jnp.full((T // LANES, LANES), _NEG_LONG, jnp.int32)

    best_dev = jnp.zeros((), jnp.int32)
    n_strips = -(-N // W)
    for si in range(n_strips):
        j0 = si * W
        bt = np.full(W, PAD_B, np.uint8)
        seg = b[j0 : j0 + W]
        bt[: seg.size] = seg
        b_tile = jnp.asarray(bt.reshape(LANES, sb).T.astype(np.int32))
        best, rch, rcf, _st = _run_strip_affine(
            b_tile, a_rows, lch, lcf, sb, blk, gap_open, gap_extend,
            unroll=unroll, interpret=interpret, f32=_f32_ok(M, N))
        lch = _shift_rows(rch, W - 1)
        lcf = _shift_rows_fill(rcf, W - 1, _NEG_LONG)
        best_dev = jnp.maximum(best_dev, jnp.max(best))
        if progress:
            progress(f"  sw-affine-long strip {si + 1}/{n_strips}")
    return int(np.asarray(best_dev))


@functools.partial(jax.jit, static_argnames=("shift", "fill"))
def _shift_rows_fill(rc: jnp.ndarray, shift: int, fill: int) -> jnp.ndarray:
    """_shift_rows with a custom tail fill (F boundary uses -inf, not 0)."""
    flat = rc.reshape(-1)
    out = jnp.full_like(flat, fill)
    out = out.at[: flat.size - shift].set(flat[shift:])
    return out.reshape(rc.shape)


def sw_affine_numpy_blocked(seq_a: bytes, seq_b: bytes,
                            gap_open: int = GAP_OPEN,
                            gap_extend: int = GAP_EXTEND) -> int:
    """Vectorized NumPy anti-diagonal Gotoh golden, O(M+N) memory."""
    a = np.frombuffer(seq_a, np.uint8).astype(np.int64)
    b = np.frombuffer(seq_b, np.uint8).astype(np.int64)
    M, N = a.size, b.size
    if M == 0 or N == 0:
        return 0
    NEG = np.int64(-(2**40))
    ph = np.zeros(M + 1, np.int64)   # H on diagonal d-1, index i+1
    ph2 = np.zeros(M + 1, np.int64)  # H on diagonal d-2
    pe = np.full(M + 1, NEG)         # E on diagonal d-1
    pf = np.full(M + 1, NEG)         # F on diagonal d-1
    best = 0
    for d in range(M + N - 1):
        lo = max(0, d - N + 1)
        hi = min(d, M - 1)
        i = np.arange(lo, hi + 1)
        s = np.where(a[i] == b[d - i], MATCH_SCORE, MISMATCH_PENALTY)
        e = np.maximum(pe[i], ph[i] + gap_open) + gap_extend       # (i-1, j)
        f = np.maximum(pf[i + 1], ph[i + 1] + gap_open) + gap_extend  # (i, j-1)
        h = np.maximum(np.maximum(ph2[i] + s, np.maximum(e, f)), 0)
        best = max(best, int(h.max()))
        ph2 = ph
        ph = np.zeros(M + 1, np.int64)
        ph[i + 1] = h
        ne = np.full(M + 1, NEG)
        ne[i + 1] = e
        nf = np.full(M + 1, NEG)
        nf[i + 1] = f
        pe, pf = ne, nf
    return best


def sw_affine_score_long_sharded(
    seq_a: bytes | np.ndarray,
    seq_b: bytes | np.ndarray,
    mesh,
    axis: str = "seq",
    gap_open: int = GAP_OPEN,
    gap_extend: int = GAP_EXTEND,
    sb: int = DEFAULT_SB,
    blk: int = DEFAULT_BLK,
    unroll: int = UNROLL,
    interpret: bool | None = None,
    progress=None,
) -> int:
    """Affine (Gotoh) long-pair SW on a device mesh: the same pipelined
    row-band / halo-exchange structure as sw_score_long_sharded, with a
    5-tile wavefront state (w, H-diag pair, E, F) and TWO carried boundary
    columns (H and F). The overlap re-sweep's garbage-boundary argument
    holds for F exactly as for H: a boundary value injected at step t only
    influences cells of rows >= t, and harvested rows precede them."""
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    a = np.frombuffer(seq_a, np.uint8) if isinstance(seq_a, (bytes, bytearray)) \
        else np.asarray(seq_a, np.uint8)
    b = np.frombuffer(seq_b, np.uint8) if isinstance(seq_b, (bytes, bytearray)) \
        else np.asarray(seq_b, np.uint8)
    M, N = a.size, b.size
    if M == 0 or N == 0:
        return 0
    C = int(mesh.shape[axis])
    sb = max(8, min(sb, -(-(-(-N // LANES)) // 8) * 8))
    W = sb * LANES
    K = -(-N // W)
    T = -(-(M + W) // (C * blk)) * (C * blk)
    band = T // C
    if band < W:
        raise ValueError(
            f"band ({band} rows) must cover one strip width ({W}); "
            f"use fewer chips, a smaller sb, or longer sequences"
        )
    Wp = -(-(W - 1) // LANES) * LANES

    a_pad = np.full(T + Wp, PAD_A, np.uint8)
    a_pad[:M] = a
    a_bands = a_pad[:T].reshape(C, band // LANES, LANES).astype(np.int32)
    a_halo = np.stack([
        a_pad[(c + 1) * band : (c + 1) * band + Wp].reshape(
            Wp // LANES, LANES)
        for c in range(C)
    ]).astype(np.int32)

    shard = NamedSharding(mesh, P(axis))
    a_bands = jax.device_put(jnp.asarray(a_bands), shard)
    a_halo = jax.device_put(jnp.asarray(a_halo), shard)
    lch = jax.device_put(jnp.zeros((C, band // LANES, LANES), jnp.int32),
                         shard)
    lcf = jax.device_put(
        jnp.full((C, band // LANES, LANES), _NEG_LONG, jnp.int32), shard)
    state = tuple(
        jax.device_put(jnp.zeros((C, sb, LANES), jnp.int32), shard)
        for _ in range(5)
    )
    best_run = jax.device_put(jnp.zeros((C, 1, LANES), jnp.int32), shard)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    f32 = _f32_ok(M, N)

    def stage_local(b_tile, a_band, a_hal, lch_in, lcf_in,
                    w0, d10, d1s0, e10, f10, flags, best_in):
        b_t = b_tile[0]
        first = flags[0, 0] != 0
        active = flags[0, 1] != 0
        chip = jax.lax.axis_index(axis)
        use_cold = (chip == 0) | ~active
        cw = w0[0] * 0 + int(PAD_A)
        cz = w0[0] * 0
        cn = w0[0] * 0 + _NEG_LONG
        st0 = (
            jnp.where(use_cold, cw, w0[0]),
            jnp.where(use_cold, cz, d10[0]),
            jnp.where(use_cold, cz, d1s0[0]),
            jnp.where(use_cold, cn, e10[0]),
            jnp.where(use_cold, cn, f10[0]),
        )
        lch_eff = jnp.where(first, 0, lch_in[0])
        lcf_eff = jnp.where(first, _NEG_LONG, lcf_in[0])
        best1, rch1, rcf1, st_t = _run_strip_affine(
            b_t, a_band[0], lch_eff, lcf_eff, sb, blk,
            gap_open, gap_extend, unroll=unroll, interpret=interpret,
            state=st0, f32=f32)
        best2, rch2, rcf2, _ = _run_strip_affine(
            b_t, a_hal[0], a_hal[0] * 0,
            a_hal[0] * 0 + _NEG_LONG, sb, Wp,
            gap_open, gap_extend, unroll=unroll, interpret=interpret,
            state=st_t, f32=f32)
        lch_next = jnp.concatenate(
            [rch1.reshape(-1)[W - 1 :], rch2.reshape(-1)[: W - 1]]
        ).reshape(lch_in[0].shape)
        lcf_next = jnp.concatenate(
            [rcf1.reshape(-1)[W - 1 :], rcf2.reshape(-1)[: W - 1]]
        ).reshape(lcf_in[0].shape)
        stage_best = jnp.maximum(jnp.max(best1), jnp.max(best2))
        best_out = jnp.maximum(best_in[0],
                               jnp.where(active, stage_best, 0))
        perm = [(i, i + 1) for i in range(C - 1)]
        nstate = tuple(
            jax.lax.ppermute(t[None], axis, perm) for t in st_t
        )
        return (lch_next[None], lcf_next[None]) + nstate + (best_out[None],)

    spec = P(axis)
    key = (mesh, axis, sb, blk, unroll, band, gap_open, gap_extend,
           bool(interpret), f32, "affine")
    stage_fn = _SHARDED_STAGE_CACHE.get(key)
    if stage_fn is None:
        stage_fn = jax.jit(shard_map(
            stage_local, mesh=mesh,
            in_specs=(spec,) * 12, out_specs=(spec,) * 8,
            check_vma=False,
        ))
        _SHARDED_STAGE_CACHE[key] = stage_fn

    for s_i in range(K + C - 1):
        b_tiles = np.full((C, W), PAD_B, np.uint8)
        flags = np.zeros((C, 2), np.int32)
        for c in range(C):
            k = s_i - c
            if 0 <= k < K:
                seg = b[k * W : (k + 1) * W]
                b_tiles[c, : seg.size] = seg
                flags[c] = (1 if k == 0 else 0, 1)
        b_t = jax.device_put(
            jnp.asarray(b_tiles.reshape(C, LANES, sb).transpose(0, 2, 1)
                        .astype(np.int32)),
            shard,
        )
        fl = jax.device_put(jnp.asarray(flags), shard)
        outs = stage_fn(b_t, a_bands, a_halo, lch, lcf, *state, fl,
                        best_run)
        lch, lcf = outs[0], outs[1]
        state = tuple(outs[2:7])
        best_run = outs[7]
        if progress:
            progress(f"  sw-affine-long-sharded stage {s_i + 1}/{K + C - 1}")
    return int(np.asarray(jnp.max(best_run)))
