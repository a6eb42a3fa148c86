"""On-chip kernel parity gate: every device kernel vs its host oracle.

Interpret-mode parity does NOT imply Mosaic correctness — the blocked-
wavefront experiment produced an interpret-exact kernel that miscompiled on
the chip (ops/sw_pallas.py's negative-results note), and the reference's own
dead kernel is racy (smith_waterman.cl:93-94). This tool closes that gap:
run it ON REAL TPU; it asserts bit-exactness (tolerance-bounded for the
float Pair-HMM) of all device kernels against their golden oracles on
randomized batches and prints one PASS/FAIL row per kernel. Exit 1 on any
failure. Wired into tools/smoke.py as the round-end on-chip gate.

Usage: python -m mini_parallel_tpu.tools.kernel_check [--seed N] [--reads B]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _rand_reads(rng, n, lo, hi):
    base = np.frombuffer(b"ACGT", np.uint8)
    return [bytes(rng.choice(base, int(rng.integers(lo, hi + 1))))
            for _ in range(n)]


def check_kadane(rng, B):
    import jax.numpy as jnp

    from mini_parallel_tpu.ops import encode, kadane

    reads_a = _rand_reads(rng, B, 40, 200)
    reads_b = _rand_reads(rng, B, 40, 200)
    arr_a, la = encode.pad_batch(reads_a, pad_to=256,
                                 pad_value=int(encode.PAD_A))
    arr_b, lb = encode.pad_batch(reads_b, pad_to=256,
                                 pad_value=int(encode.PAD_B))
    got = np.asarray(kadane.kadane_score_batch(
        jnp.asarray(arr_a), jnp.asarray(arr_b),
        jnp.asarray(la), jnp.asarray(lb)))
    want = np.array([kadane.reference_align_score(a, b)
                     for a, b in zip(reads_a, reads_b)])
    return np.array_equal(got, want), f"{B} pairs"


def check_sw(rng, B):
    import jax.numpy as jnp

    from mini_parallel_tpu.ops import encode, sw
    from mini_parallel_tpu.ops.sw_pallas import sw_score_batch_pallas

    reads_a = _rand_reads(rng, B, 100, 150)
    reads_b = _rand_reads(rng, B, 100, 150)
    arr_a, _ = encode.pad_batch(reads_a, pad_to=152,
                                pad_value=int(encode.PAD_A))
    arr_b, _ = encode.pad_batch(reads_b, pad_to=152,
                                pad_value=int(encode.PAD_B))
    got = np.asarray(sw_score_batch_pallas(jnp.asarray(arr_a),
                                           jnp.asarray(arr_b)))
    want = np.array([sw.sw_score_numpy(a, b)
                     for a, b in zip(reads_a, reads_b)])
    return np.array_equal(got, want), f"{B} pairs"


def check_sw_affine(rng, B):
    import jax.numpy as jnp

    from mini_parallel_tpu.ops import encode, sw
    from mini_parallel_tpu.ops.sw_pallas import sw_affine_batch_pallas

    reads_a = _rand_reads(rng, B, 80, 120)
    reads_b = _rand_reads(rng, B, 80, 120)
    arr_a, _ = encode.pad_batch(reads_a, pad_to=128,
                                pad_value=int(encode.PAD_A))
    arr_b, _ = encode.pad_batch(reads_b, pad_to=128,
                                pad_value=int(encode.PAD_B))
    got = np.asarray(sw_affine_batch_pallas(jnp.asarray(arr_a),
                                            jnp.asarray(arr_b)))
    want = np.array([sw.sw_affine_numpy(a, b)
                     for a, b in zip(reads_a, reads_b)])
    return np.array_equal(got, want), f"{B} pairs"


def check_sw_vs_ref(rng, B):
    import jax.numpy as jnp

    from mini_parallel_tpu.ops import encode, sw
    from mini_parallel_tpu.ops.sw_pallas import sw_vs_ref_batch_pallas

    ref = _rand_reads(rng, 1, 2000, 2000)[0]
    reads = []
    for i in range(B):
        start = int(rng.integers(0, 1900))
        r = bytearray(ref[start:start + 80])
        if i % 3 == 0 and len(r) > 10:
            r[7] = ord("A") if r[7] != ord("A") else ord("C")
        if i % 3 == 1 and len(r) > 30:
            del r[20:22]
        reads.append(bytes(r))
    arr, _ = encode.pad_batch(reads, pad_to=88, pad_value=int(encode.PAD_A))
    s, p = sw_vs_ref_batch_pallas(jnp.asarray(arr),
                                  jnp.asarray(np.frombuffer(ref, np.uint8)))
    s, p = np.asarray(s), np.asarray(p)
    for k, r in enumerate(reads):
        gs, gp = sw.sw_vs_ref_numpy(r, ref)
        if s[k] != gs or p[k] != gp:
            return False, f"read {k}: got ({s[k]},{p[k]}) want ({gs},{gp})"
    return True, f"{B} reads x 2kb ref (scores + end positions)"


def check_positions(rng, B):
    import jax.numpy as jnp

    from mini_parallel_tpu.ops import encode
    from mini_parallel_tpu.ops.sw_traceback import (sw_align_batch,
                                                    sw_positions_batch)

    reads_a, reads_b = [], []
    for i in range(B):
        b = _rand_reads(rng, 1, 60, 60)[0]
        a = bytearray(b[5:55])
        if i % 3 == 0:
            del a[20:23]
        if i % 3 == 1:
            a[10:10] = b"GGG"
        reads_a.append(bytes(a))
        reads_b.append(b)
    arr_a, _ = encode.pad_batch(reads_a, pad_to=64,
                                pad_value=int(encode.PAD_A))
    arr_b, _ = encode.pad_batch(reads_b, pad_to=64,
                                pad_value=int(encode.PAD_B))
    a, b = jnp.asarray(arr_a), jnp.asarray(arr_b)
    score, pos = sw_positions_batch(a, b)
    score, pos = np.asarray(score), np.asarray(pos)
    for k, aln in enumerate(sw_align_batch(a, b)):
        want = np.full(64, -1, np.int32)
        if aln.score > 0:
            qi, rj = aln.query_start, aln.ref_start
            for count, op in aln.cigar_ops():
                if op == "M":
                    want[qi:qi + count] = np.arange(rj, rj + count)
                    qi += count
                    rj += count
                elif op == "I":
                    qi += count
                else:
                    rj += count
        if score[k] != aln.score or not np.array_equal(pos[k], want):
            return False, f"read {k} mismatch"
    return True, f"{B} reads (device traceback vs host CIGAR walk)"


def check_positions_pallas(rng, B):
    """The Pallas packed-moves traceback (the gapped pipeline's production
    route) vs the XLA-scan path on gapped pairs."""
    import jax.numpy as jnp

    from mini_parallel_tpu.ops import encode
    from mini_parallel_tpu.ops.sw_traceback import (
        sw_positions_batch, sw_positions_batch_pallas)

    reads_a, reads_b = [], []
    for i in range(B):
        b = _rand_reads(rng, 1, 60, 60)[0]
        a = bytearray(b[5:55])
        if i % 3 == 0:
            del a[20:23]
        if i % 3 == 1:
            a[10:10] = b"GGG"
        reads_a.append(bytes(a))
        reads_b.append(b)
    arr_a, _ = encode.pad_batch(reads_a, pad_to=64,
                                pad_value=int(encode.PAD_A))
    arr_b, _ = encode.pad_batch(reads_b, pad_to=64,
                                pad_value=int(encode.PAD_B))
    a, b = jnp.asarray(arr_a), jnp.asarray(arr_b)
    s0, p0 = sw_positions_batch(a, b)
    s1, p1 = sw_positions_batch_pallas(a, b)
    if not np.array_equal(np.asarray(s0), np.asarray(s1)):
        return False, "score mismatch"
    if not np.array_equal(np.asarray(p0), np.asarray(p1)):
        return False, "positions mismatch"
    return True, f"{B} reads (packed Pallas moves vs scan path)"


def check_positions_affine_pallas(rng, B):
    """The affine (Gotoh) Pallas packed-moves traceback vs the XLA-scan
    affine path on indel-bearing pairs."""
    import jax.numpy as jnp

    from mini_parallel_tpu.ops import encode
    from mini_parallel_tpu.ops.sw_traceback import (
        sw_affine_positions_batch, sw_affine_positions_batch_pallas)

    reads_a, reads_b = [], []
    for i in range(B):
        b = _rand_reads(rng, 1, 60, 60)[0]
        a = bytearray(b[5:55])
        if i % 3 == 0:
            del a[20:24]  # 4bp deletion: affine prefers ONE gap run
        if i % 3 == 1:
            a[10:10] = b"GGGTT"
        reads_a.append(bytes(a))
        reads_b.append(b)
    arr_a, _ = encode.pad_batch(reads_a, pad_to=64,
                                pad_value=int(encode.PAD_A))
    arr_b, _ = encode.pad_batch(reads_b, pad_to=64,
                                pad_value=int(encode.PAD_B))
    a, b = jnp.asarray(arr_a), jnp.asarray(arr_b)
    s0, p0 = sw_affine_positions_batch(a, b)
    s1, p1 = sw_affine_positions_batch_pallas(a, b)
    if not np.array_equal(np.asarray(s0), np.asarray(s1)):
        return False, "score mismatch"
    if not np.array_equal(np.asarray(p0), np.asarray(p1)):
        return False, "positions mismatch"
    return True, f"{B} reads (affine packed Pallas moves vs scan path)"


def check_pairhmm(rng, B):
    from mini_parallel_tpu.ops import pairhmm
    from mini_parallel_tpu.ops.pairhmm_pallas import pairhmm_log10_batch

    reads = _rand_reads(rng, B, 80, 120)
    haps = _rand_reads(rng, B, 150, 250)
    # half the reads are noisy copies of their haplotype window (realistic
    # high-likelihood lanes); the random half probes the f32-underflow ->
    # f64-fallback path of the product API
    for i in range(0, B, 2):
        h = haps[i]
        r = bytearray(h[10:10 + min(100, len(h) - 10)])
        for _ in range(3):
            j = int(rng.integers(0, len(r)))
            r[j] = ord("ACGT"[int(rng.integers(0, 4))])
        reads[i] = bytes(r)
    quals = [np.full(len(r), 30.0) for r in reads]
    got = pairhmm_log10_batch(reads, quals, haps)
    worst = 0.0
    for i in range(B):
        want = pairhmm.pairhmm_forward_numpy(reads[i], quals[i], haps[i])
        worst = max(worst, abs(float(got[i]) - want))
    return worst < 1e-3, f"{B} pairs, max |dlog10| = {worst:.2e}"


def check_kmer(rng, B):
    import jax.numpy as jnp

    from mini_parallel_tpu.ops import encode, kmer

    reads = _rand_reads(rng, B, 40, 80)
    arr, lens = encode.pad_batch(reads, pad_to=96,
                                 pad_value=int(encode.PAD_A))
    codes = encode.ascii_to_code(jnp.asarray(arr))
    hi, lo, counts, nu = kmer.unique_counts_batch(
        codes, jnp.asarray(lens), k=21)
    out: dict = {}
    kmer.merge_device_counts(out, np.asarray(hi), np.asarray(lo),
                             np.asarray(counts))
    got = {kmer.key_to_string(h, l, 21): c for (h, l), c in out.items()}
    want = kmer.count_kmers_python(reads, k=21)
    return got == want, f"{B} reads, {len(want)} distinct 21-mers"


def check_kmer_summary(rng, B):
    """Device-side summary (distinct / histogram / top-N) vs the Python
    Counter golden — exercises the bincount scatter + lax.top_k lowering
    the no-drain path depends on (ops/kmer.py:_summary_store)."""
    import collections

    from mini_parallel_tpu.ops import encode, kmer
    from mini_parallel_tpu.ops import packed as packedmod

    reads = _rand_reads(rng, B, 40, 80)
    reads += reads[: B // 3]  # repeats: populate multi-count bins
    # capacity sized to the read count: a spill would make summary()
    # return None by contract and fail a healthy kernel at high --reads
    cap = 1 << 16
    while cap < 80 * len(reads):
        cap <<= 1
    acc = kmer.DeviceKmerAccumulator(capacity=cap, staging_batches=4,
                                     lo_bits=20)
    arr, lens = encode.pad_batch(reads, pad_to=96,
                                 pad_value=int(encode.PAD_A))
    pb = packedmod.pack_batch(arr, lens)
    hi, lo, ct, _ = kmer.unique_counts_packed(*packedmod.device_args(pb),
                                              k=21)
    acc.add(hi, lo, ct)
    s = acc.summary(top_n=10, hist_bins=64)
    assert s is not None, "accumulator spilled: raise capacity above 80*B"
    want = kmer.count_kmers_python(reads, k=21)
    mult = collections.Counter(want.values())
    hist_ok = all(int(s["hist"][c - 1]) == mult.get(c, 0)
                  for c in range(1, 64))
    top_want = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    top_got = [(kmer.key_to_string(h, l, 21), c) for h, l, c in s["top"]]
    ok = (s["n_unique"] == len(want) and hist_ok
          and {k for k, _ in top_got}
          <= {k for k, v in want.items()
              if v >= (top_want[-1][1] if top_want else 0)}
          and all(want[k] == c for k, c in top_got))
    return ok, f"{len(reads)} reads, {len(want)} distinct, top10+hist"


def check_sw_chained(rng, B):
    import jax.numpy as jnp

    from mini_parallel_tpu.ops import encode, sw
    from mini_parallel_tpu.ops.sw_pallas import sw_score_batch_chained

    reads_a = _rand_reads(rng, B, 100, 150)
    reads_b = _rand_reads(rng, B, 100, 150)
    arr_a, _ = encode.pad_batch(reads_a, pad_to=152,
                                pad_value=int(encode.PAD_A))
    arr_b, _ = encode.pad_batch(reads_b, pad_to=152,
                                pad_value=int(encode.PAD_B))
    got = np.asarray(sw_score_batch_chained(jnp.asarray(arr_a),
                                            jnp.asarray(arr_b)))
    want = np.array([sw.sw_score_numpy(a, b)
                     for a, b in zip(reads_a, reads_b)])
    return np.array_equal(got, want), f"{B} pairs (skewed chain)"


def check_sw_affine_chained(rng, B):
    import jax.numpy as jnp

    from mini_parallel_tpu.ops import encode, sw
    from mini_parallel_tpu.ops.sw_pallas import sw_affine_batch_chained

    reads_a = _rand_reads(rng, B, 80, 120)
    reads_b = _rand_reads(rng, B, 80, 120)
    arr_a, _ = encode.pad_batch(reads_a, pad_to=128,
                                pad_value=int(encode.PAD_A))
    arr_b, _ = encode.pad_batch(reads_b, pad_to=128,
                                pad_value=int(encode.PAD_B))
    got = np.asarray(sw_affine_batch_chained(jnp.asarray(arr_a),
                                             jnp.asarray(arr_b)))
    want = np.array([sw.sw_affine_numpy(a, b)
                     for a, b in zip(reads_a, reads_b)])
    return np.array_equal(got, want), f"{B} pairs (skewed chain)"


def check_sw_long(rng, B):
    from mini_parallel_tpu.ops.sw_long import (sw_score_long,
                                               sw_score_numpy_blocked)

    a = _rand_reads(rng, 1, 30_000, 30_000)[0]
    b = _rand_reads(rng, 1, 40_000, 40_000)[0]
    # plant a shared segment crossing a strip boundary
    aa, bb = bytearray(a), bytearray(b)
    seg = _rand_reads(rng, 1, 3000, 3000)[0]
    aa[5000:8000] = seg
    bb[31_000:34_000] = seg
    got = sw_score_long(bytes(aa), bytes(bb))
    want = sw_score_numpy_blocked(bytes(aa), bytes(bb))
    return got == want, f"30k x 40k strips, score {got}"


def check_sw_affine_long(rng, B):
    from mini_parallel_tpu.ops.sw_long import (sw_affine_numpy_blocked,
                                               sw_affine_score_long)

    a = _rand_reads(rng, 1, 30_000, 30_000)[0]
    b = _rand_reads(rng, 1, 40_000, 40_000)[0]
    aa, bb = bytearray(a), bytearray(b)
    seg = _rand_reads(rng, 1, 3000, 3000)[0]
    aa[5000:8000] = seg
    # split the planted segment with an insertion right at the strip
    # boundary so the F carry column is load-bearing on-chip
    ins = _rand_reads(rng, 1, 60, 60)[0]
    bb[31_000:34_060] = seg[:1500] + ins + seg[1500:]
    got = sw_affine_score_long(bytes(aa), bytes(bb))
    want = sw_affine_numpy_blocked(bytes(aa), bytes(bb))
    return got == want, f"30k x 40k affine strips, score {got}"


CHECKS = [
    ("kadane-parity", check_kadane),
    ("sw-wavefront", check_sw),
    ("sw-affine", check_sw_affine),
    ("sw-chained", check_sw_chained),
    ("sw-affine-chained", check_sw_affine_chained),
    ("sw-vs-ref", check_sw_vs_ref),
    ("sw-positions", check_positions),
    ("sw-positions-pallas", check_positions_pallas),
    ("sw-affine-positions-pallas", check_positions_affine_pallas),
    ("pairhmm-fwd", check_pairhmm),
    ("kmer-rle", check_kmer),
    ("kmer-summary", check_kmer_summary),
    ("sw-long-strips", check_sw_long),
    ("sw-affine-long-strips", check_sw_affine_long),
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--reads", type=int, default=200,
                    help="batch size per kernel check")
    ap.add_argument("--allow-cpu", action="store_true",
                    help="run in interpret mode off-TPU (NOT the real gate)")
    args = ap.parse_args(argv)

    import jax

    from mini_parallel_tpu import device

    device.enable_compile_cache()
    backend = jax.default_backend()
    if backend != "tpu" and not args.allow_cpu:
        print(f"FAIL: kernel_check requires real TPU (backend={backend}); "
              f"interpret parity does not imply Mosaic correctness "
              f"(pass --allow-cpu to run off-chip anyway)")
        return 1
    print(f"kernel parity gate on {jax.devices()[0].device_kind} "
          f"(backend={backend}, seed={args.seed})")

    failures = 0
    for name, fn in CHECKS:
        rng = np.random.default_rng(args.seed)
        try:
            ok, detail = fn(rng, args.reads)
        except Exception as e:  # a crash is a failure, not an abort
            ok, detail = False, f"EXCEPTION {str(e)[-200:]}"
        print(f"  {'PASS' if ok else 'FAIL'}  {name:16s} {detail}")
        failures += 0 if ok else 1
    print(f"{len(CHECKS) - failures}/{len(CHECKS)} kernels bit-exact"
          + (" (tolerance-bounded for pairhmm)" if failures == 0 else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
