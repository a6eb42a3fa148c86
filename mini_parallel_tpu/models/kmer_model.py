"""k-mer counting pipeline: FASTQ file -> exact k-mer counts.

The real implementation of the reference's empty ``k_mer/`` workload
(`k_mer/kmer.txt:1`), per BASELINE.json config 3: "k-mer counting (k=21) over
one FASTQ lane with exact count parity".
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from mini_parallel_tpu.io import fastq
from mini_parallel_tpu.ops import encode, kmer
from mini_parallel_tpu.utils.config import Config


@dataclass
class KmerResult:
    file_path: str
    k: int
    canonical: bool
    total_kmers: int = 0
    distinct_kmers: int = 0
    total_reads: int = 0
    seconds: float = 0.0
    counts: dict = field(default_factory=dict)  # (hi, lo) -> count

    def top(self, n: int = 10) -> list[tuple[str, int]]:
        items = sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))[:n]
        return [(kmer.key_to_string(h, l, self.k), c) for (h, l), c in items]


class KmerEngine:
    def __init__(self, cfg: Config | None = None, k: int = kmer.DEFAULT_K,
                 canonical: bool = False):
        self.cfg = cfg or Config(chunk_size_reads=10_000)
        self.k = k
        self.canonical = canonical
        self._store_factory = None
        try:
            from mini_parallel_tpu.native import available, kmer_store

            if available():
                self._store_factory = kmer_store.KmerStore
        except Exception:  # native plane not built: Python dict fallback
            pass

    def make_store(self):
        """Native hash store when built, else a plain dict."""
        return self._store_factory() if self._store_factory else {}

    def count_reads_batch(self, reads: list[bytes], agg) -> tuple[int, int]:
        """Count one batch on device, merge into ``agg``. Returns
        (n_kmers_in_batch, n_reads)."""
        pad = max(
            self.cfg.read_pad, self.k + 7, max((len(r) for r in reads), default=1)
        )
        pad = -(-pad // 8) * 8
        arr, lens = encode.pad_batch(reads, pad_to=pad, pad_value=int(encode.PAD_A))
        codes = encode.ascii_to_code(jnp.asarray(arr))
        hi, lo, counts = kmer.unique_counts_batch(
            codes, jnp.asarray(lens), k=self.k, canonical=self.canonical
        )
        hi, lo, counts = np.asarray(hi), np.asarray(lo), np.asarray(counts)
        if isinstance(agg, dict):
            kmer.merge_device_counts(agg, hi, lo, counts)
        else:  # native KmerStore: bulk merge in C++
            agg.merge(hi, lo, counts)
        return int(counts.sum()), len(reads)

    def count_file(self, path: str, progress=None) -> KmerResult:
        res = KmerResult(file_path=path, k=self.k, canonical=self.canonical)
        t0 = time.perf_counter()
        agg = self.make_store()
        for chunk in fastq.iter_read_chunks(
            path, self.cfg.chunk_size_reads, progress=progress
        ):
            n_kmers, n_reads = self.count_reads_batch([bytes(r) for r in chunk], agg)
            res.total_kmers += n_kmers
            res.total_reads += n_reads
        res.counts = agg if isinstance(agg, dict) else agg.items()
        res.distinct_kmers = len(agg)
        res.seconds = time.perf_counter() - t0
        return res
