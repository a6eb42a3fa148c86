"""Kernel perf experiments: SW wavefront variants on the real chip."""
from __future__ import annotations

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from mini_parallel_tpu.ops.encode import PAD_A, PAD_B
from mini_parallel_tpu.ops.sw import GAP_PENALTY, MATCH_SCORE, MISMATCH_PENALTY
from mini_parallel_tpu.ops import sw_pallas
from mini_parallel_tpu import device as mpt_device

mpt_device.enable_compile_cache()

READS, READ_LEN, PAD = 10_000, 150, 152


# --- V1: pre-shifted d2 (one fewer concat per step) -------------------------
def _v1_kernel(a_ref, b_ref, out_ref, w, d1, d1s, best):
    # d1s holds shift(d1) = concat([zrow, d1_prev[:-1]]) from the PREVIOUS step,
    # which is exactly shift(d2) needed for diag this step.
    M, B = a_ref.shape
    N = b_ref.shape[0]
    a = a_ref[:]
    zeros = jnp.zeros((M, B), jnp.int32)
    zrow = jnp.zeros((1, B), jnp.int32)
    w[:] = jnp.full((M, B), int(PAD_B), jnp.int32)
    d1[:] = zeros
    d1s[:] = zeros
    best[:] = zeros

    def step(d, _):
        idx = jnp.minimum(d, N - 1)
        new_row = jnp.where(d < N, b_ref[pl.ds(idx, 1), :], int(PAD_B))
        wv = jnp.concatenate([new_row, w[:][:-1]], axis=0)
        w[:] = wv
        s = jnp.where(a == wv, MATCH_SCORE, MISMATCH_PENALTY)
        d1v = d1[:]
        diag = d1s[:] + s  # d1s currently holds shift(d2)
        sh = jnp.concatenate([zrow, d1v[:-1]], axis=0)
        ud = jnp.maximum(sh, d1v) + GAP_PENALTY
        cand = jnp.maximum(jnp.maximum(diag, ud), zeros)
        best[:] = jnp.maximum(best[:], cand)
        d1s[:] = sh
        d1[:] = cand
        return ()

    jax.lax.fori_loop(0, M + N - 1, step, ())
    out_ref[:] = jnp.max(best[:], axis=0, keepdims=True)


# --- V3: int16 DP state ------------------------------------------------------
def _v3_kernel(a_ref, b_ref, out_ref, w, d1, d1s, best):
    M, B = a_ref.shape
    N = b_ref.shape[0]
    a = a_ref[:]
    zeros = jnp.zeros((M, B), jnp.int16)
    zrow16 = jnp.zeros((1, B), jnp.int16)
    w[:] = jnp.full((M, B), int(PAD_B), jnp.int32)
    d1[:] = zeros
    d1s[:] = zeros
    best[:] = zeros

    def step(d, _):
        idx = jnp.minimum(d, N - 1)
        new_row = jnp.where(d < N, b_ref[pl.ds(idx, 1), :], int(PAD_B))
        wv = jnp.concatenate([new_row, w[:][:-1]], axis=0)
        w[:] = wv
        s = jnp.where(a == wv, jnp.int16(MATCH_SCORE), jnp.int16(MISMATCH_PENALTY))
        d1v = d1[:]
        diag = d1s[:] + s
        sh = jnp.concatenate([zrow16, d1v[:-1]], axis=0)
        ud = jnp.maximum(sh, d1v) + jnp.int16(GAP_PENALTY)
        cand = jnp.maximum(jnp.maximum(diag, ud), zeros)
        best[:] = jnp.maximum(best[:], cand)
        d1s[:] = sh
        d1[:] = cand
        return ()

    jax.lax.fori_loop(0, M + N - 1, step, ())
    out_ref[:] = jnp.max(best[:].astype(jnp.int32), axis=0, keepdims=True)



# --- V3b: int16 state, int32 compare+select then downcast -------------------
def _v3b_kernel(a_ref, b_ref, out_ref, w, d1, d1s, best):
    M, B = a_ref.shape
    N = b_ref.shape[0]
    a = a_ref[:]
    zeros = jnp.zeros((M, B), jnp.int16)
    zrow16 = jnp.zeros((1, B), jnp.int16)
    w[:] = jnp.full((M, B), int(PAD_B), jnp.int32)
    d1[:] = zeros
    d1s[:] = zeros
    best[:] = zeros

    def step(d, _):
        idx = jnp.minimum(d, N - 1)
        new_row = jnp.where(d < N, b_ref[pl.ds(idx, 1), :], int(PAD_B))
        wv = jnp.concatenate([new_row, w[:][:-1]], axis=0)
        w[:] = wv
        s = jnp.where(a == wv, MATCH_SCORE, MISMATCH_PENALTY).astype(jnp.int16)
        d1v = d1[:]
        diag = d1s[:] + s
        sh = jnp.concatenate([zrow16, d1v[:-1]], axis=0)
        ud = jnp.maximum(sh, d1v) + jnp.int16(GAP_PENALTY)
        cand = jnp.maximum(jnp.maximum(diag, ud), zeros)
        best[:] = jnp.maximum(best[:], cand)
        d1s[:] = sh
        d1[:] = cand
        return ()

    jax.lax.fori_loop(0, M + N - 1, step, ())
    out_ref[:] = jnp.max(best[:].astype(jnp.int32), axis=0, keepdims=True)


# --- V4: V1 with 2x unroll ---------------------------------------------------
def _v4_kernel(a_ref, b_ref, out_ref, w, d1, d1s, best):
    M, B = a_ref.shape
    N = b_ref.shape[0]
    a = a_ref[:]
    zeros = jnp.zeros((M, B), jnp.int32)
    zrow = jnp.zeros((1, B), jnp.int32)
    w[:] = jnp.full((M, B), int(PAD_B), jnp.int32)
    d1[:] = zeros
    d1s[:] = zeros
    best[:] = zeros

    def half(d, wv_prev, d1v, d1sv, bestv):
        idx = jnp.minimum(d, N - 1)
        new_row = jnp.where(d < N, b_ref[pl.ds(idx, 1), :], int(PAD_B))
        wv = jnp.concatenate([new_row, wv_prev[:-1]], axis=0)
        s = jnp.where(a == wv, MATCH_SCORE, MISMATCH_PENALTY)
        diag = d1sv + s
        sh = jnp.concatenate([zrow, d1v[:-1]], axis=0)
        ud = jnp.maximum(sh, d1v) + GAP_PENALTY
        cand = jnp.maximum(jnp.maximum(diag, ud), zeros)
        return wv, cand, sh, jnp.maximum(bestv, cand)

    def step(k, _):
        d = 2 * k
        wv, c1, sh1, b1 = half(d, w[:], d1[:], d1s[:], best[:])
        wv2, c2, sh2, b2 = half(d + 1, wv, c1, sh1, b1)
        w[:] = wv2
        d1[:] = c2
        d1s[:] = sh2
        best[:] = b2
        return ()

    jax.lax.fori_loop(0, (M + N) // 2, step, ())
    out_ref[:] = jnp.max(best[:], axis=0, keepdims=True)



def _make_unroll_kernel(U):
    def kern(a_ref, b_ref, out_ref, w, d1, d1s, best):
        M, B = a_ref.shape
        N = b_ref.shape[0]
        a = a_ref[:]
        zeros = jnp.zeros((M, B), jnp.int32)
        zrow = jnp.zeros((1, B), jnp.int32)
        w[:] = jnp.full((M, B), int(PAD_B), jnp.int32)
        d1[:] = zeros
        d1s[:] = zeros
        best[:] = zeros

        def half(d, wv_prev, d1v, d1sv, bestv):
            idx = jnp.minimum(d, N - 1)
            new_row = jnp.where(d < N, b_ref[pl.ds(idx, 1), :], int(PAD_B))
            wv = jnp.concatenate([new_row, wv_prev[:-1]], axis=0)
            s = jnp.where(a == wv, MATCH_SCORE, MISMATCH_PENALTY)
            diag = d1sv + s
            sh = jnp.concatenate([zrow, d1v[:-1]], axis=0)
            ud = jnp.maximum(sh, d1v) + GAP_PENALTY
            cand = jnp.maximum(jnp.maximum(diag, ud), zeros)
            return wv, cand, sh, jnp.maximum(bestv, cand)

        def step(k, _):
            d = U * k
            st = (w[:], d1[:], d1s[:], best[:])
            for u in range(U):
                st = half(d + u, *st)
            w[:], d1[:], d1s[:], best[:] = st
            return ()

        jax.lax.fori_loop(0, -(-(M + N - 1) // U), step, ())
        out_ref[:] = jnp.max(best[:], axis=0, keepdims=True)

    return kern


def build(kernel, b_blk, n_scratch_i32, n_scratch_i16=0):
    @jax.jit
    def f(seq_a, seq_b):
        B, M = seq_a.shape
        N = seq_b.shape[1]
        Bp = -(-B // b_blk) * b_blk
        Mp = -(-M // 8) * 8
        Np = -(-N // 8) * 8
        at = jnp.full((Mp, Bp), int(PAD_A), jnp.int32)
        at = at.at[:M, :B].set(seq_a.astype(jnp.int32).T)
        bt = jnp.full((Np, Bp), int(PAD_B), jnp.int32)
        bt = bt.at[:N, :B].set(seq_b.astype(jnp.int32).T)
        scratch = [pltpu.VMEM((Mp, b_blk), jnp.int32) for _ in range(n_scratch_i32)]
        scratch += [pltpu.VMEM((Mp, b_blk), jnp.int16) for _ in range(n_scratch_i16)]
        out = pl.pallas_call(
            kernel,
            grid=(Bp // b_blk,),
            in_specs=[
                pl.BlockSpec((Mp, b_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((Np, b_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, b_blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            scratch_shapes=scratch,
        )(at, bt)
        return out[0, :B]

    return f


def timeit(f, a, b):
    np.asarray(f(a, b))  # compile + warm
    def run(iters):
        t0 = time.perf_counter()
        outs = [f(a, b) for _ in range(iters)]
        np.asarray(outs[-1])
        return time.perf_counter() - t0
    lo, hi = 2, 12
    dt = max((run(hi) - run(lo)) / (hi - lo), 1e-9)
    cells = READS * READ_LEN * READ_LEN
    return cells / dt / 1e9, dt * 1e3


def main():
    rng = np.random.default_rng(0)
    base = np.frombuffer(b"ACGT", np.uint8)
    ra = rng.choice(base, size=(READS, READ_LEN)).astype(np.uint8)
    rb = rng.choice(base, size=(READS, READ_LEN)).astype(np.uint8)
    aa = np.full((READS, PAD), PAD_A, np.uint8); aa[:, :READ_LEN] = ra
    bb = np.full((READS, PAD), PAD_B, np.uint8); bb[:, :READ_LEN] = rb
    a = jnp.asarray(aa); b = jnp.asarray(bb)

    golden = np.asarray(sw_pallas.sw_score_batch_pallas(a, b))
    g0, ms0 = timeit(lambda x, y: sw_pallas.sw_score_batch_pallas(x, y), a, b)
    print(f"V0 baseline (B_BLK=512): {g0:.1f} GCUPS  {ms0:.2f} ms", flush=True)

    for name, kern, blk, s32, s16 in [
        ("V4 unroll2 blk128", _make_unroll_kernel(2), 128, 4, 0),
        ("V5 unroll4 blk128", _make_unroll_kernel(4), 128, 4, 0),
        ("V5 unroll8 blk128", _make_unroll_kernel(8), 128, 4, 0),
        ("V5 unroll16 blk128", _make_unroll_kernel(16), 128, 4, 0),
    ]:
        try:
            f = build(kern, blk, s32, s16)
            out = np.asarray(f(a, b))
            ok = bool((out == golden).all())
            g, ms = timeit(f, a, b)
            print(f"{name}: {g:.1f} GCUPS  {ms:.2f} ms  correct={ok}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED ... {str(e)[-600:]}", flush=True)


if __name__ == "__main__":
    main()
