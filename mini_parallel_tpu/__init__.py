"""mini_parallel_tpu: a TPU-native sequence-analysis framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
bmwoolf/mini_parallel (Rust + OpenCL, single GPU): Smith-Waterman local
alignment, k-mer counting, and variant-call prep over whole-genome-sequencing
FASTQ data — built TPU-first:

- alignment DP as an anti-diagonal wavefront vectorized across VPU lanes
  (Pallas kernels in ``ops/``),
- FASTQ lanes streamed data-parallel over a ``jax.sharding.Mesh`` with
  psum/pmax merges over ICI (``parallel/``),
- a native C++ host data plane for FASTQ decode and k-mer aggregation
  (``native/``),
- the reference's CLI modes, .env config, checkpoint/resume, and JSON
  benchmark outputs (``cli.py``, ``utils/``).

Reference behaviors are cited as ``file:line`` into /root/reference
throughout so parity can be audited.
"""

__version__ = "0.1.0"

from mini_parallel_tpu.ops import encode, kadane, sw  # noqa: F401
