"""Pallas TPU kernel: batched Smith-Waterman anti-diagonal wavefront.

The flagship compute kernel (replaces the reference's OpenCL device code,
`smith_waterman/src/smith_waterman.cl`, with the *real* DP it only sketched in
its dead `smith_waterman_detailed` kernel at smith_waterman.cl:74-152).

Layout strategy (inter-read vectorization, the TPU analogue of SWIPE-style
inter-sequence SIMD):
- reads are TRANSPOSED to (M, B): DP position on the sublane axis, read index
  on the 128-wide lane axis, so one vector op advances one diagonal step for
  a whole block of reads at once;
- the diagonal window of ``b`` (w[i] = b[d-i]) is maintained incrementally —
  one-row insert at the top + shift down one sublane (a static concatenate,
  which Mosaic lowers better than a masked circular roll) — instead of a
  per-step gather;
- the previous diagonal is stored BOTH as-is (d1) and pre-shifted one sublane
  down (d1s): d1s written this step is exactly shift(d2) needed next step, so
  each step pays 2 shifts (window + d1) instead of 3;
- the per-cell max accumulates in a (M, B) tile and reduces once at the end,
  so the inner loop is pure elementwise VPU work with no reductions;
- the up/left gap candidates share one shift: max(D1[i-1], D1[i]) + GAP is
  valid because H >= 0 everywhere (the i=0 boundary reduces to D1[0]);
- grid over read blocks of B_BLK=128 lanes (one vreg wide — measured ~2x
  faster than 512 on v5e, better VMEM/vreg locality), UNROLL=4 diagonal
  steps per fori_loop iteration; each block's DP runs ceil((M+N-1)/UNROLL)
  loop steps entirely in VMEM. Overshoot diagonals (d >= M+N-1) are harmless:
  the window is all PAD_B there, so candidates only shrink.

Measured on TPU v5e (10k reads x 150bp): ~190-205 GCUPS under typical
load vs ~11 GCUPS for the pure-JAX scan (ops/sw.py) — the progression was
63 (naive wavefront, B_BLK=512) -> 79 (pre-shifted diagonal) -> 127
(B_BLK=128) -> 160 (unroll 4, int32) -> 190-205 (float32 state).

16-bit state negative results (all measured on this Mosaic; don't retry
blindly):
- int16: i1 mask relayout to (16,128) packing fails; arith.maxsi on i16
  not legalized.
- float16: type unsupported in the mosaic dialect outright.
- bfloat16 with select-based scoring: same i1 relayout failure.
- bfloat16 with ARITHMETIC scoring (s = 2 - 3*min(|a-w|,1), no masks at
  all): compiles and is bit-exact, but runs 2.3x SLOWER than f32 (87 vs
  197 GCUPS same window) — v5e gives no packed-bf16 elementwise ALU win;
  the ops evidently unpack. 16-bit packing is a dead end here.

Negative result (measured, do not retry blindly): a row-BLOCKED wavefront
(sweep R-row blocks carrying the block's bottom H row in VMEM as the next
block's boundary) eliminates most of the anti-diagonal ramp waste
(M x (M+N-1) positions for M x N useful cells -> (R+N-1)/N), but measured
3x SLOWER on v5e (R=32/unroll=8: 220 GCUPS vs 618 for this kernel in the
same idle window; R=8: 91) and miscompiled under Mosaic (interpret-mode
exact, on-chip mismatches). Small (R,128) tiles leave the VPU idle between
fori_loop iterations and the per-diagonal dynamic boundary-row load/store
adds a second addressing chain — big-tile few-iteration sweeps win on this
hardware even at 2x the raw op count.

Scoring: match +2 / mismatch -1 / gap -2, local alignment (floor 0), exactly
ops/sw.py's semantics; validated against it (and the NumPy golden) in tests.
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

import os

# Tuning knobs, overridable per device (tools/autotune.py finds the best):
# reads per kernel block (one vreg of lanes beat 256/512 on v5e) and
# diagonal steps per fori_loop iteration (4 beat 2/8/16 on v5e).
def _env_int(name: str, default: int) -> int:
    raw = os.environ.get(name)
    if not raw:
        return default
    try:
        val = int(raw)
        if val <= 0:
            raise ValueError(raw)
        return val
    except ValueError:
        import warnings

        warnings.warn(f"invalid {name}={raw!r}; using {default}")
        return default


B_BLK = _env_int("MPT_SW_BLOCK", 128)
UNROLL = _env_int("MPT_SW_UNROLL", 4)


def _sw_kernel_factory(unroll: int):
    def kernel(a_ref, b_ref, out_ref, w, d1, d1s, best):
        return _sw_kernel_body(a_ref, b_ref, out_ref, w, d1, d1s, best,
                               unroll)

    return kernel


def _sw_kernel_body(a_ref, b_ref, out_ref, w, d1, d1s, best, unroll):
    # DP state is FLOAT32: measured 1.27x faster than int32 on v5e (the VPU
    # is float-first; 205 vs 161 GCUPS in the same load window). Exact
    # because every H value is a small integer |H| <= 2*M << 2^24, and f32
    # add/max on integer-valued operands in that range is exact (the
    # wrapper asserts the bound). Base codes (a, w) stay int32.
    M, B = a_ref.shape
    N = b_ref.shape[0]
    a = a_ref[:]
    zeros = jnp.zeros((M, B), jnp.float32)
    zrow = jnp.zeros((1, B), jnp.float32)
    w[:] = jnp.full((M, B), int(PAD_B), jnp.int32)
    d1[:] = zeros
    d1s[:] = zeros
    best[:] = zeros

    def one_diag(d, wv_prev, d1v, d1sv, bestv):
        # advance the b-window: w[i] = b[d - i]
        idx = jnp.minimum(d, N - 1)
        new_row = jnp.where(d < N, b_ref[pl.ds(idx, 1), :], int(PAD_B))
        wv = jnp.concatenate([new_row, wv_prev[:-1]], axis=0)
        s = jnp.where(a == wv, float(MATCH_SCORE), float(MISMATCH_PENALTY))
        # d1sv is shift(previous d1) == shift(d2 of this step)
        diag = d1sv + s
        sh = jnp.concatenate([zrow, d1v[:-1]], axis=0)
        # up/left share one shift; valid since H >= 0 makes the i=0 case D1[0]
        ud = jnp.maximum(sh, d1v) + float(GAP_PENALTY)
        cand = jnp.maximum(jnp.maximum(diag, ud), zeros)
        return wv, cand, sh, jnp.maximum(bestv, cand)

    def step(k, _):
        d = unroll * k
        st = (w[:], d1[:], d1s[:], best[:])
        for u in range(unroll):
            st = one_diag(d + u, *st)
        w[:], d1[:], d1s[:], best[:] = st
        return ()

    jax.lax.fori_loop(0, -(-(M + N - 1) // unroll), step, ())
    out_ref[:] = jnp.max(best[:], axis=0, keepdims=True).astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "b_blk", "unroll"))
def sw_score_batch_pallas(
    seq_a: jnp.ndarray, seq_b: jnp.ndarray, interpret: bool | None = None,
    b_blk: int | None = None, unroll: int | None = None,
) -> jnp.ndarray:
    """Batched SW scores via the Pallas wavefront kernel.

    Args match ops/sw.py:sw_score_batch: (B, M) uint8 padded with PAD_A and
    (B, N) uint8 padded with PAD_B. Returns (B,) int32. ``b_blk``/``unroll``
    override the module defaults (autotuning; see tools/autotune.py).
    """
    b_blk = b_blk or B_BLK
    unroll = unroll or UNROLL
    B, M = seq_a.shape
    N = seq_b.shape[1]
    # f32 DP state exactness bound: |H| <= 2*min(M,N) must stay within the
    # f32 exact-integer range. Far above read lengths; longer pairs belong
    # to ops/sw_long.py (int32 strips).
    if 2 * min(M, N) >= (1 << 24):  # not assert: -O must not strip the
        # guard that keeps f32 scores exact
        raise ValueError(
            "sw_score_batch_pallas: sequences too long for exact f32 "
            "state; use ops.sw_long for long pairs"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # pad the batch to a block multiple; pad lanes are PAD_A vs PAD_B -> 0
    Bp = -(-B // b_blk) * b_blk
    Mp = -(-M // 8) * 8
    Np = -(-N // 8) * 8
    at = jnp.full((Mp, Bp), int(PAD_A), jnp.int32)
    at = at.at[:M, :B].set(seq_a.astype(jnp.int32).T)
    bt = jnp.full((Np, Bp), int(PAD_B), jnp.int32)
    bt = bt.at[:N, :B].set(seq_b.astype(jnp.int32).T)

    out = pl.pallas_call(
        _sw_kernel_factory(unroll),
        grid=(Bp // b_blk,),
        in_specs=[
            pl.BlockSpec((Mp, b_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, b_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((Mp, b_blk), jnp.int32),    # w (codes)
            pltpu.VMEM((Mp, b_blk), jnp.float32),  # d1
            pltpu.VMEM((Mp, b_blk), jnp.float32),  # d1s
            pltpu.VMEM((Mp, b_blk), jnp.float32),  # best
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * Bp * Mp * (Mp + Np),
            bytes_accessed=(Mp + Np + 1) * Bp * 4,
            transcendentals=0,
        ),
    )(at, bt)
    return out[0, :B]


def _chain_routable(B: int, M: int, N: int, k_chain: int) -> bool:
    """The skewed-chain kernel wins when the batch fills its chains and the
    pair is square-ish (the chain reclaims ramp waste ~ min(M,N)/(M+N));
    small or very rectangular batches stay on the plain wavefront.

    Gates on CHAIN_B_BLK — the b_blk the chained call actually runs with —
    not the plain kernel's env-tunable B_BLK (MPT_SW_BLOCK overrides must
    not shift this threshold; review round-3 finding)."""
    if B < k_chain * CHAIN_B_BLK:
        return False
    Mp, Np = -(-M // 8) * 8, -(-N // 8) * 8
    return max(Mp, Np) <= 2 * min(Mp, Np)


def _route_k(B: int, M: int, N: int) -> int | None:
    """Pick the chain depth for this batch: CHAIN_K when the batch fills
    its chains, else the K=4 mid-tier (autotune r4 on-chip: K=16 362.7 /
    K=8 324.5 / K=4 315.9 / K=32 245.5 / plain 191.9 GCUPS same window —
    deeper chains amortize more handover slabs, but K=4 still beats plain
    by ~1.6x for batches in [512, CHAIN_K*128))."""
    for k in (CHAIN_K, 4):
        if k <= CHAIN_K and _chain_routable(B, M, N, k):
            return k
    return None


def sw_score_batch_best(seq_a: jnp.ndarray, seq_b: jnp.ndarray) -> jnp.ndarray:
    """Fastest available SW path: Pallas kernel on TPU (skewed-chain
    when the batch shape suits it), XLA scan elsewhere."""
    if jax.default_backend() == "tpu":
        B, M = seq_a.shape
        N = seq_b.shape[1]
        # Chain route on by default: measured on-chip 2026-08-18, interleaved
        # bench.py pairs chain 201-348 vs plain 111-186 GCUPS (wins every
        # pair, all load windows). MPT_SW_CHAIN_ROUTE=0 restores plain.
        if os.environ.get("MPT_SW_CHAIN_ROUTE", "1") != "0":
            k = _route_k(B, M, N)
            if k is not None:
                return sw_score_batch_chained(seq_a, seq_b, k_chain=k)
        return sw_score_batch_pallas(seq_a, seq_b)
    from mini_parallel_tpu.ops.sw import sw_score_batch

    return sw_score_batch(seq_a, seq_b)


# ---------------------------------------------------------------------------
# Skewed-chain wavefront: reclaiming the anti-diagonal ramp.
#
# The plain wavefront sweeps M+N-1 diagonals of M-row vectors for M*N useful
# cells per pair — ~50% of the vector slots are ramp waste at M=N. This
# kernel chains K pairs per lane in STREAM coordinates: pair k's b occupies
# stream rows [k*S, k*S+N) of a (K*S+M)-row b-stream (S = max(Mp, Np) + 8),
# and the b window w[i] = B[t - i] shifts down exactly as before. Row i then
# computes pair k's cells during t in [kS+i, kS+i+N): while early rows are
# ramping OUT of pair k, late rows are still finishing and the early rows
# ramp INTO pair k+1 — the crossing front between pairs advances one row per
# step, keeping every row busy. Useful-slot fraction rises from N/(M+N-1)
# (~50%) to N/(S + M/K) (~85% at K=8, M=N=152).
#
# The per-pair state handover rides an 8-row maintenance slab at super-step
# (8-diagonal) boundaries, hoisted exactly like sw_long's row I/O
# (sw_long.py:120-137): when the front crosses rows [r, r+8) at t0 = qS + r,
# the slab (a) harvests pair q-1's finished row-maxima from `best` into a
# per-pair output row, (b) zeroes best/d1/d1s there (so the gap steps keep
# the rows at exactly 0: a_new vs PAD_B scores -1 and zero state floors the
# max at 0 — giving the correct H(i,-1) = H(i-1,-1) = 0 boundary when the
# row's first pair-q cell computes), and (c) loads pair q's a rows from the
# a-stream. The HOT LOOP IS UNCHANGED from _sw_kernel_body — no per-step
# masks or predicates (the measured killers of the round-2 b-axis-packing
# attempt); maintenance costs ~6 slab ops per 8 diagonals (~4% of the
# 8x152-row vector work).
#
# Slab-schedule correctness (why rewriting at t0 is safe): row r+j's last
# pair-(q-1) cell is at t = (q-1)S + (r+j) + N - 1 <= t0 - 2 + j - (S-N-1)
# <= t0 - 1 for j <= 7 and S >= N + 8, and its first pair-q cell is at
# t0 + j >= t0 — the whole slab is idle exactly when the maintenance runs.
# S >= Mp keeps a single crossing front live at a time (one slab per
# super-step); the wrapper guards both bounds.
# ---------------------------------------------------------------------------

# K=16 default: autotune r4 single-window sweep 362.7 (K=16) / 324.5
# (K=8) / 315.9 (K=4) / 245.5 (K=32) GCUPS — deeper chains amortize more
# handover slabs until the b-stream VMEM footprint bites at K=32. (The
# round-3 spot pairs that preferred K=4 over K=8 were taken across load
# windows, not one window — superseded by the controlled sweep.)
# Batches too small to fill 16 chains fall back to K=4 (_route_k).
CHAIN_K = _env_int("MPT_SW_CHAIN", 16)
CHAIN_B_BLK = 128  # the chained kernels' default b_blk (their signatures)


def _to_stream(x, seg_len, fill, G, k_chain, b_blk, S, rows):
    """(Bp, seg_len) per-pair rows -> (rows, G*b_blk) stream layout:
    block g, chain slot k, lane l holds pair ((g*k_chain)+k)*b_blk + l at
    stream rows [k*S, k*S + seg_len), ``fill`` elsewhere."""
    x = x.reshape(G, k_chain, b_blk, seg_len)
    x = jnp.concatenate(
        [x, jnp.full((G, k_chain, b_blk, S - seg_len), fill, jnp.int32)],
        axis=3,
    )
    x = x.transpose(0, 1, 3, 2).reshape(G, k_chain * S, b_blk)
    x = jnp.concatenate(
        [x, jnp.full((G, rows - k_chain * S, b_blk), fill, jnp.int32)],
        axis=1,
    )
    return x.transpose(1, 0, 2).reshape(rows, G * b_blk)


def _sw_chain_kernel_factory(k_chain: int, s_stride: int, m_rows: int):
    def kernel(a_ref, b_ref, out_ref, a_t, w, d1, d1s, best, out_acc):
        M, B = m_rows, a_ref.shape[1]
        S = s_stride
        zeros = jnp.zeros((M, B), jnp.float32)
        zrow = jnp.zeros((1, B), jnp.float32)
        z8 = jnp.zeros((8, B), jnp.float32)
        a_t[:] = jnp.full((M, B), int(PAD_A), jnp.int32)
        w[:] = jnp.full((M, B), int(PAD_B), jnp.int32)
        d1[:] = zeros
        d1s[:] = zeros
        best[:] = zeros
        out_acc[:] = jnp.zeros((out_acc.shape[0], B), jnp.float32)
        n_stream = b_ref.shape[0]

        def one_diag(t, a, wv_prev, d1v, d1sv, bestv):
            new_row = b_ref[pl.ds(jnp.minimum(t, n_stream - 1), 1), :]
            wv = jnp.concatenate([new_row, wv_prev[:-1]], axis=0)
            s = jnp.where(a == wv, float(MATCH_SCORE),
                          float(MISMATCH_PENALTY))
            diag = d1sv + s
            sh = jnp.concatenate([zrow, d1v[:-1]], axis=0)
            ud = jnp.maximum(sh, d1v) + float(GAP_PENALTY)
            cand = jnp.maximum(jnp.maximum(diag, ud), zeros)
            return wv, cand, sh, jnp.maximum(bestv, cand)

        def step(k, carry):
            q, r = carry
            # maintenance: the crossing front covers rows [r, r+8) iff
            # r < M (otherwise it is in the inter-pair gap)
            @pl.when(r < M)
            def _():
                red = jnp.max(best[pl.ds(r, 8), :], axis=0, keepdims=True)
                qm1 = jnp.maximum(q - 1, 0)
                out_acc[pl.ds(qm1, 1), :] = jnp.maximum(
                    out_acc[pl.ds(qm1, 1), :], red
                )
                best[pl.ds(r, 8), :] = z8
                d1[pl.ds(r, 8), :] = z8
                d1s[pl.ds(r, 8), :] = z8
                a_t[pl.ds(r, 8), :] = a_ref[pl.ds(q * S + r, 8), :]

            t0 = 8 * k
            st = (a_t[:], w[:], d1[:], d1s[:], best[:])
            a = st[0]
            st = st[1:]
            for u in range(8):
                st = one_diag(t0 + u, a, *st)
            w[:], d1[:], d1s[:], best[:] = st
            r = r + 8
            wrap = r >= S
            return (q + wrap.astype(jnp.int32), jnp.where(wrap, 0, r))

        n_super = (k_chain * s_stride + m_rows) // 8
        jax.lax.fori_loop(0, n_super, step, (jnp.int32(0), jnp.int32(0)))
        out_ref[:] = out_acc[:].astype(jnp.int32)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("interpret", "b_blk", "k_chain"))
def sw_score_batch_chained(
    seq_a: jnp.ndarray, seq_b: jnp.ndarray, interpret: bool | None = None,
    b_blk: int = 128, k_chain: int | None = None,
) -> jnp.ndarray:
    """Batched SW scores via the skewed-chain wavefront (K pairs per lane).

    Same contract as sw_score_batch_pallas; fastest when B >= k_chain *
    b_blk * n_cores and M ~ N (the wrapper requires Mp <= S = max(Mp, Np)
    + 8 structurally; it holds for any M, N by construction).
    """
    k_chain = k_chain or CHAIN_K
    B, M = seq_a.shape
    N = seq_b.shape[1]
    if 2 * min(M, N) >= (1 << 24):
        raise ValueError(
            "sw_score_batch_chained: sequences too long for exact f32 "
            "state; use ops.sw_long for long pairs"
        )
    return _chained_call(_sw_chain_kernel_factory, 3, seq_a, seq_b,
                         b_blk, k_chain, interpret, with_cost=True)


def _chained_call(make_kernel, n_state, seq_a, seq_b, b_blk, k_chain,
                  interpret, with_cost=False):
    """Shared plumbing for the skewed-chain kernels (linear + affine):
    stream layout, grid/BlockSpecs, scratch, and the pair unpack. The
    subtlest part of the layout — pair p = ((g*k_chain)+k)*b_blk + lane,
    stream row k*S + i — lives here ONCE so the two wrappers cannot
    diverge. ``make_kernel(k_chain, S, Mp)`` builds the kernel body;
    ``n_state`` is its count of (Mp, b_blk) f32 scratch refs."""
    B, M = seq_a.shape
    N = seq_b.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    Mp = -(-M // 8) * 8
    Np = -(-N // 8) * 8
    S = max(Mp, Np) + 8
    rows = k_chain * S + Mp
    lanes_per_blk = b_blk * k_chain
    Bp = -(-B // lanes_per_blk) * lanes_per_blk
    G = Bp // lanes_per_blk

    # pair p = ((g*k_chain) + k)*b_blk + lane  ->  streams (rows, G*b_blk)
    at = jnp.full((Bp, Mp), int(PAD_A), jnp.int32)
    at = at.at[:B, :M].set(seq_a.astype(jnp.int32))
    bt = jnp.full((Bp, Np), int(PAD_B), jnp.int32)
    bt = bt.at[:B, :N].set(seq_b.astype(jnp.int32))
    a_stream = _to_stream(at, Mp, int(PAD_A), G, k_chain, b_blk, S, rows)
    b_stream = _to_stream(bt, Np, int(PAD_B), G, k_chain, b_blk, S, rows)

    extra = {}
    if with_cost:
        extra["cost_estimate"] = pl.CostEstimate(
            flops=8 * G * b_blk * Mp * (k_chain * S + Mp) // k_chain,
            bytes_accessed=2 * rows * G * b_blk * 4,
            transcendentals=0,
        )
    out = pl.pallas_call(
        make_kernel(k_chain, S, Mp),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((rows, b_blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, b_blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_chain, b_blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_chain, G * b_blk), jnp.int32),
        scratch_shapes=(
            [pltpu.VMEM((Mp, b_blk), jnp.int32)   # a tile (front-loaded)
             for _ in range(2)]                    # + w (codes)
            + [pltpu.VMEM((Mp, b_blk), jnp.float32)  # DP state (d1/d1s/best
               for _ in range(n_state)]              # or h1/h1s/e1/f1/best)
            + [pltpu.VMEM((k_chain, b_blk), jnp.float32)]  # per-pair maxima
        ),
        interpret=interpret,
        **extra,
    )(a_stream, b_stream)
    # out[k, g*b_blk + lane] -> pair ((g*k_chain)+k)*b_blk + lane
    out = out.reshape(k_chain, G, b_blk).transpose(1, 0, 2).reshape(Bp)
    return out[:B]


# ---------------------------------------------------------------------------
# Reads-vs-reference exhaustive SW ("SW-ALL"): every read in the batch scored
# against ONE shared reference sequence. Because all lanes march down the
# same reference, the diagonal window of b is a single broadcast row per step
# — and with N >> M the wavefront ramp waste vanishes (useful-cell fraction
# N/(M+N) -> 1), so this kernel runs at higher efficiency than the pairwise
# one. Also tracks the reference END position of each read's best cell
# (min position on ties), which is what a seed-free mapper needs.
# ---------------------------------------------------------------------------

_POS_BIG = np.int32(2**30)


def _sw_vs_ref_kernel(a_ref, b_ref, out_ref, pos_ref, w, d1, d1s, best, bpos):
    # f32 DP state for the same 1.27x VPU win as _sw_kernel_body (exact:
    # integer-valued H, |H| <= 2*M << 2^24); codes and positions stay int32.
    M, B = a_ref.shape
    N = b_ref.shape[0]
    a = a_ref[:]
    zeros = jnp.zeros((M, B), jnp.float32)
    zrow = jnp.zeros((1, B), jnp.float32)
    w[:] = jnp.full((M, B), int(PAD_B), jnp.int32)
    d1[:] = zeros
    d1s[:] = zeros
    best[:] = zeros
    bpos[:] = jnp.full((M, B), _POS_BIG, jnp.int32)
    # ref position of cell (i, lane) on diagonal d is j = d - i
    i_col = jax.lax.broadcasted_iota(jnp.int32, (M, B), 0)

    def one_diag(d, wv_prev, d1v, d1sv, bestv, bposv):
        val = jnp.where(d < N, b_ref[pl.ds(jnp.minimum(d, N - 1), 1), :], int(PAD_B))
        new_row = jnp.broadcast_to(val, (1, B))
        wv = jnp.concatenate([new_row, wv_prev[:-1]], axis=0)
        s = jnp.where(a == wv, float(MATCH_SCORE), float(MISMATCH_PENALTY))
        diag = d1sv + s
        sh = jnp.concatenate([zrow, d1v[:-1]], axis=0)
        ud = jnp.maximum(sh, d1v) + float(GAP_PENALTY)
        cand = jnp.maximum(jnp.maximum(diag, ud), zeros)
        better = cand > bestv
        bposv = jnp.where(better, d - i_col, bposv)
        return wv, cand, sh, jnp.maximum(bestv, cand), bposv

    def step(k, _):
        d = UNROLL * k
        st = (w[:], d1[:], d1s[:], best[:], bpos[:])
        for u in range(UNROLL):
            st = one_diag(d + u, *st)
        w[:], d1[:], d1s[:], best[:], bpos[:] = st
        return ()

    jax.lax.fori_loop(0, -(-(M + N - 1) // UNROLL), step, ())
    bestv = best[:]
    maxv = jnp.max(bestv, axis=0, keepdims=True)
    out_ref[:] = maxv.astype(jnp.int32)
    # min ref position among all cells achieving the global max (f32
    # equality of exact small integers is exact)
    pos_ref[:] = jnp.min(
        jnp.where(bestv == maxv, bpos[:], _POS_BIG), axis=0, keepdims=True
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def sw_vs_ref_batch_pallas(
    reads: jnp.ndarray, ref: jnp.ndarray, interpret: bool | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exhaustive SW of every read against one reference sequence.

    Args: reads (B, M) uint8 padded with PAD_A; ref (N,) uint8 (PAD_B-pad or
    exact length). Returns (scores (B,) int32, ref_end (B,) int32) where
    ref_end is the 0-based reference index of the best cell's last aligned
    base (ties -> smallest index; -1 if the best score is 0).
    """
    B, M = reads.shape
    N = ref.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Bp = -(-B // B_BLK) * B_BLK
    Mp = -(-M // 8) * 8
    Np = -(-N // 8) * 8
    at = jnp.full((Mp, Bp), int(PAD_A), jnp.int32)
    at = at.at[:M, :B].set(reads.astype(jnp.int32).T)
    bt = jnp.full((Np, 1), int(PAD_B), jnp.int32)
    bt = bt.at[:N, 0].set(ref.astype(jnp.int32))

    scores, pos = pl.pallas_call(
        _sw_vs_ref_kernel,
        grid=(Bp // B_BLK,),
        in_specs=[
            pl.BlockSpec((Mp, B_BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B_BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B_BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Mp, B_BLK), jnp.int32),    # w (codes)
            pltpu.VMEM((Mp, B_BLK), jnp.float32),  # d1
            pltpu.VMEM((Mp, B_BLK), jnp.float32),  # d1s
            pltpu.VMEM((Mp, B_BLK), jnp.float32),  # best
            pltpu.VMEM((Mp, B_BLK), jnp.int32),    # bpos
        ],
        interpret=interpret,
    )(at, bt)
    s = scores[0, :B]
    p = jnp.where(s > 0, pos[0, :B], -1)
    return s, p

from mini_parallel_tpu.ops.sw import GAP_EXTEND, GAP_OPEN  # noqa: E402

_NEG = -(2**24)  # large-negative init that cannot overflow int32 when added
# f32 variant of the sentinel: small enough that adding per-step extends
# keeps every intermediate exactly representable (|x| < 2^24), large enough
# that no real candidate (>= -2*len) can lose to it
_NEG_F = -float(2**20)


def _sw_affine_kernel_factory(gap_open: int, gap_extend: int):
    def kernel(a_ref, b_ref, out_ref, w, h1, h1s, e1, f1, best):
        # h1s holds shift(previous h1), i.e. exactly shift(h2) needed for the
        # diagonal term this step — same pre-shift trick as _sw_kernel.
        # f32 DP state: same measured 1.27x VPU win as _sw_kernel_body;
        # exact for integer-valued scores within the asserted bound.
        M, B = a_ref.shape
        N = b_ref.shape[0]
        a = a_ref[:]
        go, ge = float(gap_open), float(gap_extend)
        zeros = jnp.zeros((M, B), jnp.float32)
        zrow = jnp.zeros((1, B), jnp.float32)
        nrow = jnp.full((1, B), _NEG_F, jnp.float32)
        w[:] = jnp.full((M, B), int(PAD_B), jnp.int32)
        h1[:] = zeros
        h1s[:] = zeros
        e1[:] = jnp.full((M, B), _NEG_F, jnp.float32)
        f1[:] = jnp.full((M, B), _NEG_F, jnp.float32)
        best[:] = zeros

        def one_diag(d, wv_prev, h1v, h1sv, ev, fv, bestv):
            idx = jnp.minimum(d, N - 1)
            new_row = jnp.where(d < N, b_ref[pl.ds(idx, 1), :], int(PAD_B))
            wv = jnp.concatenate([new_row, wv_prev[:-1]], axis=0)
            s = jnp.where(a == wv, float(MATCH_SCORE),
                          float(MISMATCH_PENALTY))
            sh = jnp.concatenate([zrow, h1v[:-1]], axis=0)
            e = jnp.maximum(ev, h1v + go) + ge
            f = (
                jnp.maximum(
                    jnp.concatenate([nrow, fv[:-1]], axis=0), sh + go
                )
                + ge
            )
            diag = h1sv + s
            h = jnp.maximum(jnp.maximum(diag, 0.0), jnp.maximum(e, f))
            return wv, h, sh, e, f, jnp.maximum(bestv, h)

        def step(k, _):
            d = UNROLL * k
            st = (w[:], h1[:], h1s[:], e1[:], f1[:], best[:])
            for u in range(UNROLL):
                st = one_diag(d + u, *st)
            w[:], h1[:], h1s[:], e1[:], f1[:], best[:] = st
            return ()

        jax.lax.fori_loop(0, -(-(M + N - 1) // UNROLL), step, ())
        out_ref[:] = jnp.max(best[:], axis=0, keepdims=True).astype(jnp.int32)

    return kernel


def _sw_affine_chain_kernel_factory(gap_open: int, gap_extend: int,
                                    k_chain: int, s_stride: int,
                                    m_rows: int):
    """Skewed-chain Gotoh kernel: see the linear chain kernel's block
    comment. Maintenance resets h1/h1s/best to 0 and e1/f1 to _NEG_F; the
    <= 8 gap steps a row idles through evolve e to go + k*ge, and the
    row's first real cell computes max(go + k*ge, H(i,-1)=0 + go) + ge =
    go + ge — the exact E(i, 0) boundary (ge < 0 makes the stale term
    lose), so the handover is exact without per-step masking."""
    def kernel(a_ref, b_ref, out_ref, a_t, w, h1, h1s, e1, f1, best,
               out_acc):
        M, B = m_rows, a_ref.shape[1]
        S = s_stride
        go, ge = float(gap_open), float(gap_extend)
        zeros = jnp.zeros((M, B), jnp.float32)
        zrow = jnp.zeros((1, B), jnp.float32)
        nrow = jnp.full((1, B), _NEG_F, jnp.float32)
        z8 = jnp.zeros((8, B), jnp.float32)
        n8 = jnp.full((8, B), _NEG_F, jnp.float32)
        a_t[:] = jnp.full((M, B), int(PAD_A), jnp.int32)
        w[:] = jnp.full((M, B), int(PAD_B), jnp.int32)
        h1[:] = zeros
        h1s[:] = zeros
        e1[:] = jnp.full((M, B), _NEG_F, jnp.float32)
        f1[:] = jnp.full((M, B), _NEG_F, jnp.float32)
        best[:] = zeros
        out_acc[:] = jnp.zeros((out_acc.shape[0], B), jnp.float32)
        n_stream = b_ref.shape[0]

        def one_diag(t, a, wv_prev, h1v, h1sv, ev, fv, bestv):
            new_row = b_ref[pl.ds(jnp.minimum(t, n_stream - 1), 1), :]
            wv = jnp.concatenate([new_row, wv_prev[:-1]], axis=0)
            s = jnp.where(a == wv, float(MATCH_SCORE),
                          float(MISMATCH_PENALTY))
            sh = jnp.concatenate([zrow, h1v[:-1]], axis=0)
            e = jnp.maximum(ev, h1v + go) + ge
            f = (jnp.maximum(jnp.concatenate([nrow, fv[:-1]], axis=0),
                             sh + go) + ge)
            diag = h1sv + s
            h = jnp.maximum(jnp.maximum(diag, 0.0), jnp.maximum(e, f))
            return wv, h, sh, e, f, jnp.maximum(bestv, h)

        def step(k, carry):
            q, r = carry

            @pl.when(r < M)
            def _():
                red = jnp.max(best[pl.ds(r, 8), :], axis=0, keepdims=True)
                qm1 = jnp.maximum(q - 1, 0)
                out_acc[pl.ds(qm1, 1), :] = jnp.maximum(
                    out_acc[pl.ds(qm1, 1), :], red
                )
                best[pl.ds(r, 8), :] = z8
                h1[pl.ds(r, 8), :] = z8
                h1s[pl.ds(r, 8), :] = z8
                e1[pl.ds(r, 8), :] = n8
                f1[pl.ds(r, 8), :] = n8
                a_t[pl.ds(r, 8), :] = a_ref[pl.ds(q * S + r, 8), :]

            t0 = 8 * k
            st = (a_t[:], w[:], h1[:], h1s[:], e1[:], f1[:], best[:])
            a = st[0]
            st = st[1:]
            for u in range(8):
                st = one_diag(t0 + u, a, *st)
            w[:], h1[:], h1s[:], e1[:], f1[:], best[:] = st
            r = r + 8
            wrap = r >= S
            return (q + wrap.astype(jnp.int32), jnp.where(wrap, 0, r))

        n_super = (k_chain * s_stride + m_rows) // 8
        jax.lax.fori_loop(0, n_super, step, (jnp.int32(0), jnp.int32(0)))
        out_ref[:] = out_acc[:].astype(jnp.int32)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("gap_open", "gap_extend", "interpret",
                                    "b_blk", "k_chain"))
def sw_affine_batch_chained(
    seq_a: jnp.ndarray, seq_b: jnp.ndarray,
    gap_open: int = GAP_OPEN, gap_extend: int = GAP_EXTEND,
    interpret: bool | None = None, b_blk: int = 128,
    k_chain: int | None = None,
) -> jnp.ndarray:
    """Batched affine-gap SW via the skewed-chain wavefront."""
    k_chain = k_chain or CHAIN_K
    B, M = seq_a.shape
    N = seq_b.shape[1]
    if (abs(_NEG_F) + (M + N) * max(abs(gap_extend), 1)
            + abs(gap_open) + 2 * min(M, N)) >= (1 << 24):
        raise ValueError(
            "sw_affine_batch_chained: gap params too large for exact f32 "
            "state"
        )
    return _chained_call(
        lambda k, S, Mp: _sw_affine_chain_kernel_factory(
            gap_open, gap_extend, k, S, Mp),
        5, seq_a, seq_b, b_blk, k_chain, interpret)


@functools.partial(jax.jit, static_argnames=("gap_open", "gap_extend", "interpret"))
def sw_affine_batch_pallas(
    seq_a: jnp.ndarray,
    seq_b: jnp.ndarray,
    gap_open: int = GAP_OPEN,
    gap_extend: int = GAP_EXTEND,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Batched affine-gap SW via the Pallas wavefront kernel."""
    B, M = seq_a.shape
    N = seq_b.shape[1]
    # f32 exactness: every intermediate must stay an exactly-representable
    # integer. The largest magnitudes are the sentinel plus gap terms:
    # |_NEG_F| + (M+N)*|gap_extend| + |gap_open| (gap_open is added at most
    # once per gap re-opening on top of a running E/F) — bound the SUM, not
    # just the extend term (advisor round-2 finding).
    if (abs(_NEG_F) + (M + N) * max(abs(gap_extend), 1)
            + abs(gap_open) + 2 * min(M, N)) >= (1 << 24):
        raise ValueError(
            "sw_affine_batch_pallas: gap params too large for exact f32 state"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Bp = -(-B // B_BLK) * B_BLK
    Mp = -(-M // 8) * 8
    Np = -(-N // 8) * 8
    at = jnp.full((Mp, Bp), int(PAD_A), jnp.int32)
    at = at.at[:M, :B].set(seq_a.astype(jnp.int32).T)
    bt = jnp.full((Np, Bp), int(PAD_B), jnp.int32)
    bt = bt.at[:N, :B].set(seq_b.astype(jnp.int32).T)

    out = pl.pallas_call(
        _sw_affine_kernel_factory(gap_open, gap_extend),
        grid=(Bp // B_BLK,),
        in_specs=[
            pl.BlockSpec((Mp, B_BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, B_BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B_BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((Mp, B_BLK), jnp.int32),    # w (codes)
            pltpu.VMEM((Mp, B_BLK), jnp.float32),  # h1
            pltpu.VMEM((Mp, B_BLK), jnp.float32),  # h1s
            pltpu.VMEM((Mp, B_BLK), jnp.float32),  # e1
            pltpu.VMEM((Mp, B_BLK), jnp.float32),  # f1
            pltpu.VMEM((Mp, B_BLK), jnp.float32),  # best
        ],
        interpret=interpret,
    )(at, bt)
    return out[0, :B]


def sw_affine_batch_best(
    seq_a: jnp.ndarray, seq_b: jnp.ndarray,
    gap_open: int = GAP_OPEN, gap_extend: int = GAP_EXTEND,
) -> jnp.ndarray:
    """Fastest available affine-gap SW path (mirror of sw_score_batch_best).

    Chain route on by default: measured on-chip 2026-08-19, interleaved
    10k x 150bp pairs chained 124-178 vs plain 96-116 GCUPS (won all 6
    pairs, medians 160.3 vs 102.7). MPT_SW_CHAIN_ROUTE=0 restores plain.
    """
    if jax.default_backend() == "tpu":
        B, M = seq_a.shape
        N = seq_b.shape[1]
        if os.environ.get("MPT_SW_CHAIN_ROUTE", "1") != "0":
            k = _route_k(B, M, N)
            if k is not None:
                return sw_affine_batch_chained(
                    seq_a, seq_b, gap_open=gap_open, gap_extend=gap_extend,
                    k_chain=k)
        return sw_affine_batch_pallas(
            seq_a, seq_b, gap_open=gap_open, gap_extend=gap_extend)
    from mini_parallel_tpu.ops.sw import sw_affine_batch

    return sw_affine_batch(
        seq_a, seq_b, gap_open=gap_open, gap_extend=gap_extend)
