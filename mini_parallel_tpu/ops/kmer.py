"""k-mer counting: 2-bit packing, device-side sort/dedup, exact counts.

The reference *advertises* k-mer counting (`README.md:2`) but ships only a
placeholder (`k_mer/kmer.txt:1` = "filler"); BASELINE.json config 3 requires
k=21 counting with exact parity. This is the real implementation, TPU-first:

- bases 2-bit packed (A=0 C=1 G=2 T=3); a k=21-mer needs 42 bits, split into
  (hi, lo) int32 halves since TPU lacks native int64 vectors. Windows
  containing N (or crossing a read's end) are masked out.
- all windows of a read batch are packed with k static shifted adds (XLA
  fuses the whole thing into a few vector ops),
- exact per-batch counting = lexicographic sort of (hi, lo) via lax.sort +
  run-length encoding into fixed-size (keys, counts) arrays — the
  "sorted-hash reduction in HBM" the north star asks for,
- cross-chunk / cross-shard merging happens on host (Python dict here; the
  C++ kmer store in native/ is the fast path) or via psum of bucketed
  histograms for the sharded pipeline stats.

Canonical mode folds each k-mer with its reverse complement (min of the two
encodings), the standard convention for strand-neutral counting.
"""

from __future__ import annotations

import functools
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np

from mini_parallel_tpu.ops import encode

DEFAULT_K = 21
# sentinel sort key for invalid windows: sorts after every real (hi, lo)
_SENTINEL = np.int32(2**31 - 1)


def pack_kmers(
    codes: jnp.ndarray, lengths: jnp.ndarray, k: int = DEFAULT_K,
    canonical: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pack every length-k window of a (B, L) code batch.

    Returns (hi, lo, valid), each (B, W) with W = L - k + 1.
    hi holds the first ceil(k/2) bases (2 bits each), lo the rest; a window is
    valid iff it lies within the read's true length and contains no N.
    """
    B, L = codes.shape
    W = L - k + 1
    if W <= 0:
        raise ValueError(f"read pad {L} shorter than k={k}")
    c = codes.astype(jnp.int32)
    k_hi = (k + 1) // 2  # bases in the hi word (<= 16 -> <= 32 bits)

    hi = jnp.zeros((B, W), jnp.int32)
    lo = jnp.zeros((B, W), jnp.int32)
    ok = jnp.ones((B, W), dtype=bool)
    for i in range(k):
        ci = jax.lax.dynamic_slice_in_dim(c, i, W, axis=1)
        ok = ok & (ci <= 3)  # N/pad codes are > 3
        if i < k_hi:
            hi = hi * 4 + jnp.where(ci <= 3, ci, 0)
        else:
            lo = lo * 4 + jnp.where(ci <= 3, ci, 0)
    pos = jnp.arange(W, dtype=jnp.int32)[None, :]
    ok = ok & (pos + k <= lengths[:, None])

    if canonical:
        rc_hi, rc_lo = _revcomp_key(c, k, W)
        fwd_smaller = (hi < rc_hi) | ((hi == rc_hi) & (lo <= rc_lo))
        hi = jnp.where(fwd_smaller, hi, rc_hi)
        lo = jnp.where(fwd_smaller, lo, rc_lo)
    return hi, lo, ok


def _revcomp_key(c: jnp.ndarray, k: int, W: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(hi, lo) of the reverse-complement of each window."""
    k_hi = (k + 1) // 2
    comp = jnp.where(c <= 3, 3 - c, c)  # A<->T, C<->G in code space
    hi = jnp.zeros(c.shape[:1] + (W,), jnp.int32)
    lo = jnp.zeros_like(hi)
    # reverse complement reads window positions k-1 .. 0
    for j, i in enumerate(range(k - 1, -1, -1)):
        ci = jax.lax.dynamic_slice_in_dim(comp, i, W, axis=1)
        ci = jnp.where(ci <= 3, ci, 0)
        if j < k_hi:
            hi = hi * 4 + ci
        else:
            lo = lo * 4 + ci
    return hi, lo


@functools.partial(jax.jit, static_argnames=("k", "canonical"))
def unique_counts_batch(
    codes: jnp.ndarray, lengths: jnp.ndarray, k: int = DEFAULT_K,
    canonical: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Device-exact k-mer counting for one read batch.

    Returns (keys_hi, keys_lo, counts, n_unique): flat arrays of length B*W,
    sorted by key with runs collapsed — all unique keys live in positions
    [0, n_unique), so callers need only fetch that prefix off-device —
    plus the scalar unique count.
    """
    hi, lo, ok = pack_kmers(codes, lengths, k, canonical)
    n = hi.size
    hi = jnp.where(ok, hi, _SENTINEL).reshape(n)
    lo = jnp.where(ok, lo, _SENTINEL).reshape(n)
    okf = ok.reshape(n)

    hi_s, lo_s, ok_s = jax.lax.sort((hi, lo, okf), num_keys=2)
    prev_hi = jnp.concatenate([jnp.full((1,), -1, jnp.int32), hi_s[:-1]])
    prev_lo = jnp.concatenate([jnp.full((1,), -1, jnp.int32), lo_s[:-1]])
    is_start = ok_s & ((hi_s != prev_hi) | (lo_s != prev_lo))
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # unique index per slot
    counts = jax.ops.segment_sum(
        ok_s.astype(jnp.int32), jnp.where(ok_s, seg, n - 1), num_segments=n
    )
    # place unique keys at their segment index
    key_hi = jnp.full((n,), _SENTINEL, jnp.int32)
    key_lo = jnp.full((n,), _SENTINEL, jnp.int32)
    idx = jnp.where(is_start, seg, n - 1)
    key_hi = key_hi.at[idx].set(jnp.where(is_start, hi_s, _SENTINEL))
    key_lo = key_lo.at[idx].set(jnp.where(is_start, lo_s, _SENTINEL))
    n_unique = jnp.sum(is_start.astype(jnp.int32))
    counts = counts * (jnp.arange(n) < n_unique)
    return key_hi, key_lo, counts, n_unique


@functools.partial(jax.jit, static_argnames=("k", "canonical"))
def unique_counts_packed(
    packed: jnp.ndarray, exc_col: jnp.ndarray, exc_val: jnp.ndarray,
    lengths: jnp.ndarray, k: int = DEFAULT_K, canonical: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """unique_counts_batch over a 2-bit packed wire batch (ops/packed.py).

    Reads cross host->device at 4 bases/byte; the unpack fuses into the
    window packing, so this is strictly cheaper than shipping ASCII.
    """
    from mini_parallel_tpu.ops import packed as packedmod

    ascii_ = packedmod.unpack_device(
        packed, exc_col, exc_val, lengths, int(encode.PAD_A)
    )
    codes = encode.ascii_to_code(ascii_)
    return unique_counts_batch(codes, lengths, k=k, canonical=canonical)


def key_to_string(hi: int, lo: int, k: int = DEFAULT_K) -> str:
    """Decode a (hi, lo) key back to its ACGT string (host, debugging/tests)."""
    k_hi = (k + 1) // 2
    bases = "ACGT"
    out = []
    v = int(hi)
    for _ in range(k_hi):
        out.append(bases[v & 3])
        v >>= 2
    head = "".join(reversed(out))
    out = []
    v = int(lo)
    for _ in range(k - k_hi):
        out.append(bases[v & 3])
        v >>= 2
    return head + "".join(reversed(out))


def count_kmers_python(reads: list[bytes], k: int = DEFAULT_K,
                       canonical: bool = False) -> Counter:
    """Pure-Python golden counter (tests / small inputs)."""
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    c: Counter = Counter()
    for r in reads:
        r = r.upper()
        for j in range(len(r) - k + 1):
            w = r[j : j + k]
            if any(b not in b"ACGT" for b in w):
                continue
            if canonical:
                rc = w.translate(comp)[::-1]
                w = min(w, rc)
            c[w.decode()] += 1
    return c


def merge_device_counts(
    agg: dict, key_hi: np.ndarray, key_lo: np.ndarray, counts: np.ndarray
) -> dict:
    """Merge one device batch's (keys, counts) into a host accumulator dict
    keyed by the 42-bit integer (hi << 32 | lo_bits... stored as (hi, lo))."""
    nz = counts > 0
    for h, l, ct in zip(key_hi[nz].tolist(), key_lo[nz].tolist(), counts[nz].tolist()):
        key = (h, l)
        agg[key] = agg.get(key, 0) + ct
    return agg
