"""Empirical VPU roofline: how close the SW wavefront kernel runs to the
chip's attainable vector throughput.

"Speed of light" claims need a ceiling measured the same way as the kernel
(same compiler, same chip, same tunnel, same slope-timing discipline), not a
datasheet number. This tool measures two rates:

1. ``peak``: a fused serial dependency chain of int32 add+max pairs — the SW
   inner loop's exact op mix — over a VMEM-resident tile. XLA fuses the
   unrolled chain into one kernel, so per-call HBM traffic is one read of
   the operands and one write of the result while the chain does CHAIN x 2
   ops per element: compute-bound by construction. The serial dependency
   (each step consumes the previous) prevents any algebraic collapse.

2. ``sw``: the wavefront kernel's sustained vector-op rate. The kernel
   (ops/sw_pallas.py:_sw_kernel_body) executes B x M x (M+N-1) wavefront
   lane-positions per batch (the anti-diagonal sweep pays a ramp-up/down on
   top of the M x N useful cells) and performs ~9 arithmetic vector ops +
   2 sublane shifts per position (compare/select scoring, diagonal add,
   shared up/left gap max+add, 3-way clamp max, running-best max, row
   select; window + diagonal shifts).

efficiency = sw_ops_per_s / peak_ops_per_s. Both numbers move with tunnel
load; run back-to-back and prefer an idle chip. Prints one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

CHAIN = 2048  # serial add+max pairs per element per call
TILE = (2048, 512)  # int32: 4 MB operand
BLK = 256  # rows per Pallas block (VMEM-resident working set)
SW_ARITH_OPS_PER_POS = 9  # counted from _sw_kernel_body's one_diag
SW_SHIFT_OPS_PER_POS = 2  # window + diagonal sublane shifts

READS = 10_000
READ_LEN = 150
PAD = 152


def _slope(fn, lo: int = 2, hi: int = 12, reps: int = 5) -> float:
    """Per-call seconds net of fixed dispatch latency (bench.py discipline:
    dispatch N, fetch once; median over reps — tunnel stalls can inflate
    either endpoint, so single slopes err in both directions and min would
    select the inflated flukes)."""

    def timed(iters: int) -> float:
        t0 = time.perf_counter()
        outs = [fn() for _ in range(iters)]
        np.asarray(outs[-1])
        return time.perf_counter() - t0

    slopes = sorted(max((timed(hi) - timed(lo)) / (hi - lo), 1e-12)
                    for _ in range(reps))
    return slopes[len(slopes) // 2]


def measure_peak_chain() -> float:
    """Attainable int32 add+max ops/s, measured with a Pallas kernel whose
    working set provably lives in VMEM (scratch carry; same memory space and
    loop structure as the SW kernel), so the chain is compute-bound by
    construction rather than by fusion heuristics."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, out_ref, y):
        y[:] = a_ref[:]

        def step(i, _):
            y[:] = jnp.maximum(y[:] + a_ref[:], b_ref[:])
            return ()

        jax.lax.fori_loop(0, CHAIN, step, ())
        out_ref[:] = y[:]

    grid = TILE[0] // BLK
    chain = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((BLK, TILE[1]), lambda i: (i, 0))] * 2,
        out_specs=pl.BlockSpec((BLK, TILE[1]), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(TILE, jnp.int32),
        scratch_shapes=[pltpu.VMEM((BLK, TILE[1]), jnp.int32)],
        interpret=jax.default_backend() != "tpu",
    )
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(-3, 3, TILE, np.int32))
    b = jnp.asarray(rng.integers(-100, 100, TILE, np.int32))
    np.asarray(chain(a, b))  # compile + real fetch (tunnel drains on fetch)
    dt = _slope(lambda: chain(a, b))
    return TILE[0] * TILE[1] * CHAIN * 2 / dt


def measure_sw() -> tuple[float, float, float]:
    """-> (useful GCUPS, wavefront positions/s, batch seconds)."""
    import jax.numpy as jnp

    from mini_parallel_tpu.ops import encode
    from mini_parallel_tpu.ops.sw_pallas import sw_score_batch_best

    rng = np.random.default_rng(0)
    base = np.frombuffer(b"ACGT", np.uint8)
    arr_a = np.full((READS, PAD), encode.PAD_A, np.uint8)
    arr_b = np.full((READS, PAD), encode.PAD_B, np.uint8)
    arr_a[:, :READ_LEN] = rng.choice(base, size=(READS, READ_LEN))
    arr_b[:, :READ_LEN] = rng.choice(base, size=(READS, READ_LEN))
    a, b = jnp.asarray(arr_a), jnp.asarray(arr_b)
    np.asarray(sw_score_batch_best(a, b))
    dt = _slope(lambda: sw_score_batch_best(a, b))
    useful = READS * READ_LEN * READ_LEN / dt
    positions = READS * PAD * (2 * PAD - 1) / dt
    return useful / 1e9, positions, dt


def main() -> None:
    import jax

    from mini_parallel_tpu import device

    device.enable_compile_cache()
    peak = measure_peak_chain()
    gcups, positions, dt = measure_sw()
    sw_ops = positions * (SW_ARITH_OPS_PER_POS + SW_SHIFT_OPS_PER_POS)
    print(json.dumps({
        "metric": "sw_vpu_efficiency",
        "value": round(sw_ops / peak, 4),
        "unit": "fraction_of_measured_vpu_peak",
        "extra": {
            "peak_chain_int32_ops_per_s": round(peak / 1e9, 1),
            "sw_vector_ops_per_s_gops": round(sw_ops / 1e9, 1),
            "sw_useful_gcups": round(gcups, 1),
            "sw_wavefront_positions_per_s_g": round(positions / 1e9, 2),
            "ops_per_position": SW_ARITH_OPS_PER_POS + SW_SHIFT_OPS_PER_POS,
            "batch_latency_ms": round(dt * 1e3, 3),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
