"""Batched Pair-HMM forward on the TPU VPU: the wavefront kernel.

Same anti-diagonal layout as the SW kernels (ops/sw_pallas.py): reads on
sublanes (one DP row per scratch row), lanes carry B_BLK independent
(read, haplotype) pairs, state lives in VMEM scratch refs, and the
diagonal dependency is carried as pre-shifted previous-diagonal slabs.
Differences from SW:

- three carried matrices (M, I, D — float32 probabilities) instead of one
  int32 score, and a SUM accumulator instead of a running max;
- the free-start boundary D[0, j] = 1/hap_len enters as the shift-in row of
  the D diagonal (scaled by 2^120, the standard fp32 Pair-HMM trick);
- the result is the final read row's M+I summed over valid haplotype
  columns, gathered per lane with a (row == read_len-1) & (col < hap_len)
  mask as the wavefront passes through.

Returns log10 P(read | hap); lanes that underflow fp32 (likelihood <
~1e-74 after unscaling) come back as -inf and the caller falls back to the
float64 NumPy oracle (ops/pairhmm.py) for those reads only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mini_parallel_tpu.ops.encode import PAD_A, PAD_B
from mini_parallel_tpu.ops.pairhmm import (
    DEFAULT_GAP_EXT_PHRED,
    DEFAULT_GAP_OPEN_PHRED,
    LOG10_2,
    SCALE_LOG2,
    pairhmm_forward_numpy,
    transition_probs,
)
from mini_parallel_tpu.ops.sw_pallas import B_BLK, _env_int

UNROLL = _env_int("MPT_PHMM_UNROLL", 8)  # v5e sweeps: 75/85/96/98 GCUPS at
# 1/2/4/8 (round 1) and 92/84/93/95 (round-2 autotune) — 8 wins both
# B_BLK (from sw_pallas) measured best at 128 for this kernel too:
# 88.7 / 71.4 / 61.5 GCUPS at 128/256/512 on v5e (same vreg-locality story)


def _pairhmm_kernel_factory(tMM: float, tMI: float, tII: float, tIM: float,
                            unroll: int):
    tMD, tDD, tDM = tMI, tII, tIM
    scale = float(2.0 ** SCALE_LOG2)

    def kernel(a_ref, e_ref, b_ref, la_ref, lb_ref, out_ref,
               w, m1, i1, d1, ms2, is2, ds2, acc):
        M, B = a_ref.shape
        N = b_ref.shape[0]
        a = a_ref[:]
        e = e_ref[:]
        zrow = jnp.zeros((1, B), jnp.float32)
        lb = lb_ref[:]
        drow = scale / jnp.maximum(lb, 1).astype(jnp.float32)  # D[0, j]
        la1 = la_ref[:] - 1
        rows = jax.lax.broadcasted_iota(jnp.int32, (M, B), 0)
        last_row = rows == la1  # per-lane final read row
        zeros = jnp.zeros((M, B), jnp.float32)
        w[:] = jnp.full((M, B), int(PAD_B), jnp.int32)
        m1[:] = zeros
        i1[:] = zeros
        d1[:] = zeros
        ms2[:] = zeros
        is2[:] = zeros
        # first diagonal's [i-1, j-1] is the boundary cell (0, 0)
        ds2[:] = jnp.concatenate([drow, zeros[:-1]], axis=0)
        acc[:] = zeros

        def one_diag(d, wv_prev, m1v, i1v, d1v, ms2v, is2v, ds2v, accv):
            idx = jnp.minimum(d, N - 1)
            new_row = jnp.where(d < N, b_ref[pl.ds(idx, 1), :], int(PAD_B))
            wv = jnp.concatenate([new_row, wv_prev[:-1]], axis=0)
            prior = jnp.where(a == wv, 1.0 - e, e * (1.0 / 3.0))
            mnew = prior * (tMM * ms2v + tIM * is2v + tDM * ds2v)
            shM = jnp.concatenate([zrow, m1v[:-1]], axis=0)
            shI = jnp.concatenate([zrow, i1v[:-1]], axis=0)
            inew = tMI * shM + tII * shI
            dnew = tMD * m1v + tDD * d1v
            shD = jnp.concatenate([drow, d1v[:-1]], axis=0)
            # final-row cell this diagonal sits at hap column j-1 = d - la1
            valid = last_row & ((d - la1) < lb)
            accv = accv + jnp.where(valid, mnew + inew, 0.0)
            return wv, mnew, inew, dnew, shM, shI, shD, accv

        def step(k, _):
            d = unroll * k
            st = (w[:], m1[:], i1[:], d1[:], ms2[:], is2[:], ds2[:], acc[:])
            for u in range(unroll):
                st = one_diag(d + u, *st)
            (w[:], m1[:], i1[:], d1[:], ms2[:], is2[:], ds2[:], acc[:]) = st
            return ()

        jax.lax.fori_loop(0, -(-(M + N - 1) // unroll), step, ())
        out_ref[:] = jnp.sum(acc[:], axis=0, keepdims=True)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("gap_open_phred", "gap_ext_phred", "interpret",
                     "unroll"),
)
def pairhmm_batch_pallas(
    reads: jnp.ndarray,  # (B, M) uint8 ASCII, padded with PAD_A
    err: jnp.ndarray,  # (B, M) float32 per-base error prob
    haps: jnp.ndarray,  # (B, N) uint8 ASCII, padded with PAD_B
    read_lens: jnp.ndarray,  # (B,) int32
    hap_lens: jnp.ndarray,  # (B,) int32
    gap_open_phred: float = DEFAULT_GAP_OPEN_PHRED,
    gap_ext_phred: float = DEFAULT_GAP_EXT_PHRED,
    interpret: bool | None = None,
    unroll: int | None = None,
) -> jnp.ndarray:
    """-> (B,) float32 log10 P(read | hap); -inf where empty or underflowed."""
    B, M = reads.shape
    N = haps.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    unroll = unroll or UNROLL
    tMM, tMI, tII, tIM = transition_probs(gap_open_phred, gap_ext_phred)
    Bp = -(-B // B_BLK) * B_BLK
    Mp = -(-M // 8) * 8
    Np = -(-N // 8) * 8
    at = jnp.full((Mp, Bp), int(PAD_A), jnp.int32)
    at = at.at[:M, :B].set(reads.astype(jnp.int32).T)
    et = jnp.zeros((Mp, Bp), jnp.float32).at[:M, :B].set(err.T)
    bt = jnp.full((Np, Bp), int(PAD_B), jnp.int32)
    bt = bt.at[:N, :B].set(haps.astype(jnp.int32).T)
    lat = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(read_lens)
    lbt = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(hap_lens)

    out = pl.pallas_call(
        _pairhmm_kernel_factory(tMM, tMI, tII, tIM, unroll),
        grid=(Bp // B_BLK,),
        in_specs=[
            pl.BlockSpec((Mp, B_BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, B_BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, B_BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B_BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B_BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B_BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM((Mp, B_BLK), jnp.int32)]
            + [pltpu.VMEM((Mp, B_BLK), jnp.float32) for _ in range(7)]
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=14 * Bp * Mp * (Mp + Np),
            bytes_accessed=(2 * Mp + Np + 2) * Bp * 4,
            transcendentals=0,
        ),
    )(at, et, bt, lat, lbt)
    total = out[0, :B]
    # unscale; non-positive or non-finite -> -inf (caller falls back to f64)
    ll = jnp.where(
        (total > 0) & jnp.isfinite(total),
        jnp.log10(jnp.maximum(total, 1e-45)) - SCALE_LOG2 * LOG10_2,
        -jnp.inf,
    )
    return ll


def make_pairhmm_sharded(mesh, data_axis: str | None = None,
                         gap_open_phred: float = DEFAULT_GAP_OPEN_PHRED,
                         gap_ext_phred: float = DEFAULT_GAP_EXT_PHRED):
    """shard_map Pair-HMM: the batch axis shards across the mesh, each chip
    runs the wavefront kernel on its rows (likelihoods are per-lane, so no
    collective is needed). -> jitted fn(reads, err, haps, la, lb) -> (B,)
    log10 likelihoods. B must be divisible by the mesh size."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = data_axis or mesh.axis_names[0]

    def local(reads, err, haps, la, lb):
        return pairhmm_batch_pallas(
            reads, err, haps, la, lb,
            gap_open_phred=gap_open_phred, gap_ext_phred=gap_ext_phred,
        )

    spec2, spec1 = P(axis, None), P(axis)
    return jax.jit(shard_map(
        local, mesh=mesh,
        check_vma=False,  # Pallas out_shape has no varying-axis info
        in_specs=(spec2, spec2, spec2, spec1, spec1),
        out_specs=spec1,
    ))


_SHARDED_CACHE: dict = {}


def pairhmm_log10_batch(
    reads: list[bytes],
    quals: list[bytes | np.ndarray],
    haps: list[bytes],
    gap_open_phred: float = DEFAULT_GAP_OPEN_PHRED,
    gap_ext_phred: float = DEFAULT_GAP_EXT_PHRED,
    mesh=None,
) -> np.ndarray:
    """Host-facing batch API. ``quals``: Phred+33 ASCII bytes or numeric
    Phred arrays, one per read. Lanes that underflow the fp32 kernel are
    recomputed with the float64 oracle — exact at any quality. With
    ``mesh``, the batch shards over the data axis (padded to the mesh
    size; the jitted sharded fn is cached per mesh/scoring)."""
    from mini_parallel_tpu.ops import encode

    B = len(reads)
    if B == 0:
        return np.empty(0, np.float64)
    phreds = [
        np.frombuffer(q, np.uint8).astype(np.float64) - 33.0
        if isinstance(q, (bytes, bytearray)) else np.asarray(q, np.float64)
        for q in quals
    ]
    M = 1 << max(int(np.ceil(np.log2(max(len(r) for r in reads) or 1))), 3)
    N = 1 << max(int(np.ceil(np.log2(max(len(h) for h in haps) or 1))), 3)
    # bucket B too: the assignment count is data-dependent, and every new
    # shape is a remote compile (CLAUDE.md) — pad lanes are empty -> -inf,
    # sliced off below
    Bp = 1 << max(int(np.ceil(np.log2(B))), 7)
    if mesh is not None:
        Bp = -(-Bp // mesh.devices.size) * mesh.devices.size
    pad_n = Bp - B
    arr_r, la = encode.pad_batch(reads + [b""] * pad_n, pad_to=M,
                                 pad_value=int(PAD_A))
    arr_h, lb = encode.pad_batch(haps + [b""] * pad_n, pad_to=N,
                                 pad_value=int(PAD_B))
    err = np.zeros((Bp, M), np.float32)
    for i, p in enumerate(phreds):
        err[i, : len(p)] = 10.0 ** (-p / 10.0)
    if mesh is not None:
        key = (mesh, gap_open_phred, gap_ext_phred)
        fn = _SHARDED_CACHE.get(key)
        if fn is None:
            fn = _SHARDED_CACHE[key] = make_pairhmm_sharded(
                mesh, gap_open_phred=gap_open_phred,
                gap_ext_phred=gap_ext_phred,
            )
    else:
        fn = functools.partial(pairhmm_batch_pallas,
                               gap_open_phred=gap_open_phred,
                               gap_ext_phred=gap_ext_phred)
    ll = np.asarray(
        fn(jnp.asarray(arr_r), jnp.asarray(err), jnp.asarray(arr_h),
           jnp.asarray(la), jnp.asarray(lb)),
        np.float64,
    )[:B]
    for i in np.flatnonzero(~np.isfinite(ll)):
        if len(reads[i]) and len(haps[i]):
            ll[i] = pairhmm_forward_numpy(
                reads[i], phreds[i], haps[i],
                gap_open_phred=gap_open_phred, gap_ext_phred=gap_ext_phred,
            )
    return ll
