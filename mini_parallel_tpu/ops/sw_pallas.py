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
- two previous diagonals live in VMEM scratch; the per-cell max accumulates
  in a (M, B) tile and reduces once at the end, so the inner loop is pure
  elementwise VPU work with no reductions;
- the up/left gap candidates share one shift: max(D1[i-1], D1[i]) + GAP is
  valid because H >= 0 everywhere (the i=0 boundary reduces to D1[0]);
- grid over read blocks of B_BLK lanes; each block's DP runs M+N-1 fori_loop
  steps entirely in VMEM.

Measured on TPU v5e (10k reads x 150bp, int32): ~63 GCUPS vs ~11 GCUPS for
the pure-JAX scan (ops/sw.py). int16 variants currently fail to lower in
Mosaic (sublane roll/compare on i16), else they would double vreg packing.

Scoring: match +2 / mismatch -1 / gap -2, local alignment (floor 0), exactly
ops/sw.py's semantics; validated against it (and the NumPy golden) in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mini_parallel_tpu.ops.encode import PAD_A, PAD_B
from mini_parallel_tpu.ops.sw import GAP_PENALTY, MATCH_SCORE, MISMATCH_PENALTY

B_BLK = 512  # reads per kernel block (lane axis; 512 beat 1024/2048 on v5e)


def _sw_kernel(a_ref, b_ref, out_ref, w, d1, d2, best):
    M, B = a_ref.shape
    N = b_ref.shape[0]
    a = a_ref[:]
    zeros = jnp.zeros((M, B), jnp.int32)
    zrow = jnp.zeros((1, B), jnp.int32)
    w[:] = jnp.full((M, B), int(PAD_B), jnp.int32)
    d1[:] = zeros
    d2[:] = zeros
    best[:] = zeros

    def step(d, _):
        # advance the b-window: w[i] = b[d - i]
        idx = jnp.minimum(d, N - 1)
        new_row = jnp.where(d < N, b_ref[pl.ds(idx, 1), :], int(PAD_B))
        wv = jnp.concatenate([new_row, w[:][:-1]], axis=0)
        w[:] = wv

        s = jnp.where(a == wv, MATCH_SCORE, MISMATCH_PENALTY)
        d1v = d1[:]
        diag = jnp.concatenate([zrow, d2[:][:-1]], axis=0) + s
        # up/left share one shift; valid since H >= 0 makes the i=0 case D1[0]
        ud = (
            jnp.maximum(jnp.concatenate([zrow, d1v[:-1]], axis=0), d1v)
            + GAP_PENALTY
        )
        cand = jnp.maximum(jnp.maximum(diag, ud), zeros)
        best[:] = jnp.maximum(best[:], cand)
        d2[:] = d1v
        d1[:] = cand
        return ()

    jax.lax.fori_loop(0, M + N - 1, step, ())
    out_ref[:] = jnp.max(best[:], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sw_score_batch_pallas(
    seq_a: jnp.ndarray, seq_b: jnp.ndarray, interpret: bool | None = None
) -> jnp.ndarray:
    """Batched SW scores via the Pallas wavefront kernel.

    Args match ops/sw.py:sw_score_batch: (B, M) uint8 padded with PAD_A and
    (B, N) uint8 padded with PAD_B. Returns (B,) int32.
    """
    B, M = seq_a.shape
    N = seq_b.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # pad the batch to a block multiple; pad lanes are PAD_A vs PAD_B -> 0
    Bp = -(-B // B_BLK) * B_BLK
    Mp = -(-M // 8) * 8
    Np = -(-N // 8) * 8
    at = jnp.full((Mp, Bp), int(PAD_A), jnp.int32)
    at = at.at[:M, :B].set(seq_a.astype(jnp.int32).T)
    bt = jnp.full((Np, Bp), int(PAD_B), jnp.int32)
    bt = bt.at[:N, :B].set(seq_b.astype(jnp.int32).T)

    out = pl.pallas_call(
        _sw_kernel,
        grid=(Bp // B_BLK,),
        in_specs=[
            pl.BlockSpec((Mp, B_BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, B_BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B_BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((Mp, B_BLK), jnp.int32) for _ in range(4)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * Bp * Mp * (Mp + Np),
            bytes_accessed=(Mp + Np + 1) * Bp * 4,
            transcendentals=0,
        ),
    )(at, bt)
    return out[0, :B]


def sw_score_batch_best(seq_a: jnp.ndarray, seq_b: jnp.ndarray) -> jnp.ndarray:
    """Fastest available SW path: Pallas kernel on TPU, XLA scan elsewhere."""
    if jax.default_backend() == "tpu":
        return sw_score_batch_pallas(seq_a, seq_b)
    from mini_parallel_tpu.ops.sw import sw_score_batch

    return sw_score_batch(seq_a, seq_b)


# ---------------------------------------------------------------------------
# Affine-gap (Gotoh) wavefront kernel: same layout as _sw_kernel plus E/F
# gap-state diagonals in scratch.
# ---------------------------------------------------------------------------

from mini_parallel_tpu.ops.sw import GAP_EXTEND, GAP_OPEN  # noqa: E402

_NEG = -(2**24)  # large-negative init that cannot overflow int32 when added


def _sw_affine_kernel_factory(gap_open: int, gap_extend: int):
    def kernel(a_ref, b_ref, out_ref, w, h1, h2, e1, f1, best):
        M, B = a_ref.shape
        N = b_ref.shape[0]
        a = a_ref[:]
        zeros = jnp.zeros((M, B), jnp.int32)
        zrow = jnp.zeros((1, B), jnp.int32)
        nrow = jnp.full((1, B), _NEG, jnp.int32)
        w[:] = jnp.full((M, B), int(PAD_B), jnp.int32)
        h1[:] = zeros
        h2[:] = zeros
        e1[:] = jnp.full((M, B), _NEG, jnp.int32)
        f1[:] = jnp.full((M, B), _NEG, jnp.int32)
        best[:] = zeros

        def step(d, _):
            idx = jnp.minimum(d, N - 1)
            new_row = jnp.where(d < N, b_ref[pl.ds(idx, 1), :], int(PAD_B))
            wv = jnp.concatenate([new_row, w[:][:-1]], axis=0)
            w[:] = wv
            s = jnp.where(a == wv, MATCH_SCORE, MISMATCH_PENALTY)
            h1v = h1[:]
            e = jnp.maximum(e1[:], h1v + gap_open) + gap_extend
            f = (
                jnp.maximum(
                    jnp.concatenate([nrow, f1[:][:-1]], axis=0),
                    jnp.concatenate([zrow, h1v[:-1]], axis=0) + gap_open,
                )
                + gap_extend
            )
            diag = jnp.concatenate([zrow, h2[:][:-1]], axis=0) + s
            h = jnp.maximum(jnp.maximum(diag, 0), jnp.maximum(e, f))
            best[:] = jnp.maximum(best[:], h)
            h2[:] = h1v
            h1[:] = h
            e1[:] = e
            f1[:] = f
            return ()

        jax.lax.fori_loop(0, M + N - 1, step, ())
        out_ref[:] = jnp.max(best[:], axis=0, keepdims=True)

    return kernel


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
        scratch_shapes=[pltpu.VMEM((Mp, B_BLK), jnp.int32) for _ in range(6)],
        interpret=interpret,
    )(at, bt)
    return out[0, :B]
