"""Autotune the SW wavefront kernel's (block, unroll) for THIS device.

The defaults (B_BLK=128, UNROLL=4) were tuned on TPU v5e; other generations
have different vreg/VMEM trade-offs. This sweeps the grid, validates
every candidate against the XLA-scan oracle, and prints the winner plus the env
settings (MPT_SW_BLOCK / MPT_SW_UNROLL) that make it stick.

Usage: python -m mini_parallel_tpu.tools.autotune [--reads 10000] [--len 150]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=10_000)
    ap.add_argument("--len", type=int, default=150, dest="read_len")
    ap.add_argument("--blocks", type=int, nargs="*", default=[128, 256, 512])
    ap.add_argument("--unrolls", type=int, nargs="*", default=[1, 2, 4, 8])
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from mini_parallel_tpu.device import enable_compile_cache
    from mini_parallel_tpu.ops import encode, sw
    from mini_parallel_tpu.ops.sw_pallas import sw_score_batch_pallas

    enable_compile_cache()
    rng = np.random.default_rng(0)
    base = np.frombuffer(b"ACGT", np.uint8)
    pad = -(-args.read_len // 8) * 8
    arr_a = np.full((args.reads, pad), encode.PAD_A, np.uint8)
    arr_b = np.full((args.reads, pad), encode.PAD_B, np.uint8)
    arr_a[:, : args.read_len] = rng.choice(base, size=(args.reads, args.read_len))
    arr_b[:, : args.read_len] = rng.choice(base, size=(args.reads, args.read_len))
    a, b = jnp.asarray(arr_a), jnp.asarray(arr_b)
    golden = np.asarray(sw.sw_score_batch(a[:256], b[:256]))
    cells = args.reads * args.read_len * args.read_len

    def timed(fn, iters):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(iters)]
        np.asarray(outs[-1])
        return time.perf_counter() - t0

    best = None
    for blk in args.blocks:
        for unr in args.unrolls:
            fn = lambda: sw_score_batch_pallas(a, b, b_blk=blk, unroll=unr)
            try:
                got = np.asarray(
                    sw_score_batch_pallas(a[:256], b[:256], b_blk=blk,
                                          unroll=unr)
                )
                if not (got == golden).all():
                    raise ValueError("WRONG RESULT")
                np.asarray(fn())  # warm the full-size shape
                # median-of-5 POSITIVE slopes (bench.py discipline): under
                # queued tunnel dispatch a slope can come out <= 0, and a
                # min-of clamped to the epsilon floor once elected a
                # garbage 2.25e8-"GCUPS" winner
                slopes = []
                for _ in range(5):
                    sl = (timed(fn, 7) - timed(fn, 2)) / 5
                    if sl > 1e-6:
                        slopes.append(sl)
                if not slopes:
                    raise ValueError("no positive timing slope (tunnel "
                                     "load too erratic)")
                slopes.sort()
                dt = slopes[len(slopes) // 2]
                gcups = cells / dt / 1e9
                print(f"block={blk:4d} unroll={unr}: {gcups:7.1f} GCUPS")
                if best is None or gcups > best[0]:
                    best = (gcups, blk, unr)
            except Exception as e:  # noqa: BLE001 — report and keep sweeping
                print(f"block={blk:4d} unroll={unr}: FAILED {str(e)[-120:]}")
    if best is None:
        print("no working configuration found")
        return 1
    g, blk, unr = best
    # the env knobs also retune the affine and vs-ref kernels (more scratch
    # buffers, different lowerings): validate the winner there before
    # recommending it globally
    import os

    os.environ["MPT_SW_BLOCK"] = str(blk)
    os.environ["MPT_SW_UNROLL"] = str(unr)
    import importlib

    from mini_parallel_tpu.ops import sw_pallas

    importlib.reload(sw_pallas)
    try:
        aff = np.asarray(sw_pallas.sw_affine_batch_pallas(a[:256], b[:256]))
        ref_seq = jnp.asarray(arr_b[0, : args.read_len])
        sw_pallas.sw_vs_ref_batch_pallas(a[:256], ref_seq)
        want_aff = np.asarray(sw.sw_affine_batch(a[:256], b[:256]))
        if not (aff == want_aff).all():
            raise ValueError("affine kernel wrong under winning config")
    except Exception as e:  # noqa: BLE001
        print(f"\nbest: block={blk} unroll={unr} ({g:.1f} GCUPS) for the "
              f"score kernel ONLY — affine/vs-ref failed under it: "
              f"{str(e)[-120:]}")
        print("pass b_blk=/unroll= per call instead of the env export")
        return 0
    print(f"\nbest: block={blk} unroll={unr} ({g:.1f} GCUPS; affine and "
          f"vs-ref kernels validated)")
    print(f"export MPT_SW_BLOCK={blk} MPT_SW_UNROLL={unr}")

    # --- Skewed-chain wavefront: sweep K (MPT_SW_CHAIN) -------------------
    best_k = None
    for K in (4, 8, 16):
        fnc = lambda K=K: sw_pallas.sw_score_batch_chained(a, b, k_chain=K)
        try:
            got = np.asarray(
                sw_pallas.sw_score_batch_chained(a[:256], b[:256], k_chain=K)
            )
            if not (got == golden).all():
                raise ValueError("WRONG RESULT")
            np.asarray(fnc())
            slopes = []
            for _ in range(5):
                sl = (timed(fnc, 7) - timed(fnc, 2)) / 5
                if sl > 1e-6:
                    slopes.append(sl)
            if not slopes:
                raise ValueError("no positive timing slope")
            slopes.sort()
            gcups = cells / slopes[len(slopes) // 2] / 1e9
            print(f"chain K={K:2d}: {gcups:7.1f} GCUPS")
            if best_k is None or gcups > best_k[0]:
                best_k = (gcups, K)
        except Exception as e:  # noqa: BLE001
            print(f"chain K={K:2d}: FAILED {str(e)[-120:]}")
    if best_k is not None:
        print(f"chain best: K={best_k[1]} ({best_k[0]:.1f} GCUPS vs plain "
              f"{g:.1f}); export MPT_SW_CHAIN={best_k[1]}")

    # --- Pair-HMM forward: sweep its own unroll (MPT_PHMM_UNROLL) ---------
    from mini_parallel_tpu.ops import pairhmm
    from mini_parallel_tpu.ops.pairhmm_pallas import pairhmm_batch_pallas

    hap_len = 2 * args.read_len
    arr_h = np.full((args.reads, -(-hap_len // 8) * 8), encode.PAD_B, np.uint8)
    arr_h[:, :hap_len] = rng.choice(base, size=(args.reads, hap_len))
    h = jnp.asarray(arr_h)
    err = jnp.full((args.reads, pad), 1e-3, jnp.float32)
    la = jnp.full((args.reads,), args.read_len, jnp.int32)
    lb = jnp.full((args.reads,), hap_len, jnp.int32)
    # oracle spot-check lanes (use real mismatch content: slice of the hap)
    oreads = [bytes(arr_h[i, 5 : 5 + 24]) for i in range(4)]
    want_ll = np.array([
        pairhmm.pairhmm_forward_numpy(r, np.full(24, 30.0), bytes(
            arr_h[i, :hap_len])) for i, r in enumerate(oreads)
    ])
    cells_ph = args.reads * args.read_len * hap_len
    best_ph = None
    for unr in args.unrolls:
        fn = lambda: pairhmm_batch_pallas(a, err, h, la, lb, unroll=unr)
        try:
            from mini_parallel_tpu.ops import encode as enc
            oa, ola = enc.pad_batch(oreads, pad_to=24, pad_value=int(enc.PAD_A))
            got_ll = np.asarray(pairhmm_batch_pallas(
                jnp.asarray(oa), jnp.full((4, 24), 1e-3, jnp.float32),
                h[:4], jnp.asarray(ola), lb[:4], unroll=unr))
            if not np.allclose(got_ll, want_ll, atol=5e-3):
                raise ValueError("WRONG RESULT")
            np.asarray(fn())
            dt = min(max((timed(fn, 7) - timed(fn, 2)) / 5, 1e-9)
                     for _ in range(2))
            g_ph = cells_ph / dt / 1e9
            print(f"pairhmm unroll={unr}: {g_ph:7.1f} GCUPS")
            if best_ph is None or g_ph > best_ph[0]:
                best_ph = (g_ph, unr)
        except Exception as e:  # noqa: BLE001
            print(f"pairhmm unroll={unr}: FAILED {str(e)[-120:]}")
    if best_ph is not None:
        print(f"export MPT_PHMM_UNROLL={best_ph[1]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
