"""Generate a WGS-scale synthetic lane set for soak runs.

The reference is engineered around 51.8M reads per file
(smith_waterman/src/aligner.rs:214, ~415M reads total across the dataset,
main.rs:100-102).  This environment can't store nor stream that over the
tunnel in a round, but a >=10M-read multi-lane set exercises everything the
25k-read test fixtures never touch: the k-mer accumulator's staging clamp
(2^26 slots) and HBM spill, chunk-checkpoint cadence at real chunk counts,
and steady-state (not startup-dominated) duty cycle.

Reads are sampled from one synthetic genome so k-mer content is repetitive
(realistic for the merge path) with a small substitution error rate, plus a
slice of pure-random reads to keep a distinct-key tail.

Usage:
    python -m mini_parallel_tpu.tools.make_scale_data OUTDIR \
        [--lanes 8] [--reads-per-lane 1250000] [--read-len 150]

Lanes are written in parallel worker processes; each lane is a gzip FASTQ
named SCALE_L00N_R1_001.fastq.gz (the pipeline's lane glob).
"""
from __future__ import annotations

import argparse
import gzip
import multiprocessing as mp
import os
import time

import numpy as np

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
_GENOME_MB = 32  # 32 Mbp synthetic genome shared by all lanes (seeded)


def _genome(seed: int = 1234) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return _BASES[rng.integers(0, 4, size=_GENOME_MB * 1_000_000, dtype=np.int64)]


def write_lane(path: str, n_reads: int, read_len: int, seed: int) -> None:
    rng = np.random.default_rng(seed)
    genome = _genome()
    chunk = 50_000
    qual = np.full(read_len, ord("I"), dtype=np.uint8).tobytes()
    with gzip.open(path, "wb", compresslevel=1) as fh:
        written = 0
        while written < n_reads:
            n = min(chunk, n_reads - written)
            starts = rng.integers(0, genome.size - read_len, size=n)
            idx = starts[:, None] + np.arange(read_len)[None, :]
            reads = genome[idx]
            # ~0.5% substitution errors keep alignments non-trivial.
            err = rng.random(reads.shape) < 0.005
            reads = np.where(err, _BASES[rng.integers(0, 4, size=reads.shape)], reads)
            # 2% pure-random reads: a distinct-k-mer tail for the accumulator.
            n_rand = max(1, n // 50)
            reads[:n_rand] = _BASES[rng.integers(0, 4, size=(n_rand, read_len))]
            buf = bytearray()
            for i in range(n):
                buf += b"@r%d_%d\n" % (seed, written + i)
                buf += reads[i].tobytes()
                buf += b"\n+\n"
                buf += qual
                buf += b"\n"
            fh.write(bytes(buf))
            written += n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--lanes", type=int, default=8)
    ap.add_argument("--reads-per-lane", type=int, default=1_250_000)
    ap.add_argument("--read-len", type=int, default=150)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    t0 = time.time()
    jobs = []
    for lane in range(1, args.lanes + 1):
        path = os.path.join(args.outdir, f"SCALE_L{lane:03d}_R1_001.fastq.gz")
        jobs.append((path, args.reads_per_lane, args.read_len, lane))
    with mp.Pool(min(args.lanes, os.cpu_count() or 4)) as pool:
        pool.starmap(write_lane, jobs)
    total = args.lanes * args.reads_per_lane
    print(f"wrote {args.lanes} lanes x {args.reads_per_lane} reads "
          f"({total} total, {args.read_len}bp) in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
