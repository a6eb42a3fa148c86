"""Headline benchmark: batched Smith-Waterman on one chip.

Measures the flagship kernel on BASELINE.json config 2 — "Batched SW: 10k
reads x 150bp" — and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

value: DP throughput in GCUPS (giga cell-updates/sec) for true
Smith-Waterman over the 10,000-pair batch (10k x 150 x 150 = 225e6 cells).

vs_baseline: the reference never published throughput (SURVEY.md §6); its
only stated performance target is "sub-200 ms processing" per chunk
(improvements.txt:61), which it did not achieve. vs_baseline is therefore
(200 ms / measured batch latency) on the same 10k-read unit of work — >1.0
means faster than the reference's aspirational target.
"""

from __future__ import annotations

import json
import time

import numpy as np

READS = 10_000
READ_LEN = 150
PAD = 152  # 150bp rounded to the sublane tile (less wavefront padding than 160)
REFERENCE_TARGET_MS = 200.0  # improvements.txt:61 (aspirational, not achieved)


def _enable_compile_cache() -> None:
    import os

    import jax

    cache_dir = os.environ.get(
        "MPT_CACHE_DIR", os.path.expanduser("~/.cache/mini_parallel_tpu/jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _arm_watchdog() -> None:
    """Emit one honest failure line instead of hanging forever.

    Device init and the first dispatch block indefinitely if the axon
    tunnel is down (observed: jax.devices() hangs >2 min with no timeout);
    a silent hang leaves the driver with no record at all. The watchdog
    prints the headline JSON with value null and hard-exits once
    MPT_BENCH_TIMEOUT seconds (default 1800 — generous against the
    worst observed 300 s remote compile plus loaded timing loops) pass
    without the measurement completing."""
    import os
    import threading

    budget = float(os.environ.get("MPT_BENCH_TIMEOUT", "1800"))

    def fire() -> None:
        print(
            json.dumps(
                {
                    "metric": "batched_sw_10k_reads_150bp",
                    "value": None,
                    "unit": "GCUPS",
                    "vs_baseline": None,
                    "extra": {
                        "error": f"no measurement after {budget:.0f}s "
                                 "(device tunnel unreachable?)"
                    },
                }
            ),
            flush=True,
        )
        os._exit(3)

    t = threading.Timer(budget, fire)
    t.daemon = True
    t.start()
    return t


def main() -> None:
    watchdog = _arm_watchdog()

    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from mini_parallel_tpu.ops import encode
    from mini_parallel_tpu.ops.sw_pallas import sw_score_batch_best

    rng = np.random.default_rng(0)
    base = np.frombuffer(b"ACGT", np.uint8)
    reads_a = rng.choice(base, size=(READS, READ_LEN)).astype(np.uint8)
    reads_b = rng.choice(base, size=(READS, READ_LEN)).astype(np.uint8)
    arr_a = np.full((READS, PAD), encode.PAD_A, np.uint8)
    arr_b = np.full((READS, PAD), encode.PAD_B, np.uint8)
    arr_a[:, :READ_LEN] = reads_a
    arr_b[:, :READ_LEN] = reads_b

    a = jnp.asarray(arr_a)
    b = jnp.asarray(arr_b)

    # warm-up / compile (np.asarray forces a real device fetch; on the axon
    # tunnel block_until_ready returns before execution completes)
    np.asarray(sw_score_batch_best(a, b))

    def timed(iters: int) -> float:
        t0 = time.perf_counter()
        outs = [sw_score_batch_best(a, b) for _ in range(iters)]
        np.asarray(outs[-1])  # device executes serially; one fetch drains all
        return time.perf_counter() - t0

    # slope method: per-batch compute time net of the fixed host<->device
    # roundtrip latency (which dominates small timings through the tunnel).
    # median-of-5: tunnel stalls inflate either endpoint, so a single slope
    # can err in EITHER direction (a stall in timed(lo) — or load dropping
    # between the endpoints — shrinks the slope and inflates GCUPS; a stall
    # in timed(hi) does the reverse). The median is robust to both; min
    # would select the inflated flukes.
    lo, hi = 2, 12
    slopes = sorted(
        max((timed(hi) - timed(lo)) / (hi - lo), 1e-9) for _ in range(5)
    )
    dt = slopes[len(slopes) // 2]

    cells = READS * READ_LEN * READ_LEN
    gcups = cells / dt / 1e9
    batch_ms = dt * 1e3
    watchdog.cancel()  # a teardown stall must not emit a second (null) line
    print(
        json.dumps(
            {
                "metric": "batched_sw_10k_reads_150bp",
                "value": round(gcups, 3),
                "unit": "GCUPS",
                "vs_baseline": round(REFERENCE_TARGET_MS / batch_ms, 3),
                "extra": {
                    "batch_latency_ms": round(batch_ms, 3),
                    "reads_per_s": round(READS / dt),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
