"""Pair-HMM forward algorithm: P(read | haplotype) for genotype likelihoods.

The core likelihood kernel of GATK-HaplotypeCaller-style variant calling —
the natural companion of this framework's variant-prep stage (the reference
advertises "variant calling (with DeepVariant)", `README.md:2`, with an
empty directory behind it; SURVEY.md §2 #14). Model (the standard GATK
formulation, e.g. the gpuPairHMM literature):

states M (match/mismatch), I (insertion in read), D (deletion from read);

    M[i,j] = prior(i,j) * (tMM*M[i-1,j-1] + tIM*I[i-1,j-1] + tDM*D[i-1,j-1])
    I[i,j] = tMI*M[i-1,j] + tII*I[i-1,j]
    D[i,j] = tMD*M[i,j-1] + tDD*D[i,j-1]

with prior = 1-err if read[i-1]==hap[j-1] else err/3 (err from the base's
Phred quality), transitions from gap-open/extend Phreds
(tMM=1-2δ, tMI=tMD=δ, tII=tDD=ε, tIM=tDM=1-ε), free start anywhere on the
haplotype via the boundary row D[0,j] = 1/hap_len, and free end:

    P(read|hap) = Σ_j M[m,j] + I[m,j].

Numerics: the device kernel works in float32 scaled by 2^120 (the standard
fp32 Pair-HMM trick); results that underflow to 0 are recomputed with this
module's float64 NumPy oracle. log10-likelihoods are returned everywhere.
"""

from __future__ import annotations

import numpy as np

DEFAULT_GAP_OPEN_PHRED = 45.0
DEFAULT_GAP_EXT_PHRED = 10.0
SCALE_LOG2 = 120.0  # fp32 initial-condition scale, 2**120
LOG10_2 = float(np.log10(2.0))


def transition_probs(gap_open_phred: float = DEFAULT_GAP_OPEN_PHRED,
                     gap_ext_phred: float = DEFAULT_GAP_EXT_PHRED):
    """(tMM, tMI, tII, tIM) with tMD=tMI and tDD=tII, tDM=tIM."""
    delta = 10.0 ** (-gap_open_phred / 10.0)
    eps = 10.0 ** (-gap_ext_phred / 10.0)
    return 1.0 - 2.0 * delta, delta, eps, 1.0 - eps


def pairhmm_forward_numpy(read: bytes, qual_phred: np.ndarray, hap: bytes,
                          gap_open_phred: float = DEFAULT_GAP_OPEN_PHRED,
                          gap_ext_phred: float = DEFAULT_GAP_EXT_PHRED,
                          ) -> float:
    """Golden float64 oracle. Returns log10 P(read | hap).

    ``qual_phred``: per-base Phred scores (ints or floats, len == len(read)).
    """
    m, n = len(read), len(hap)
    if m == 0 or n == 0:
        return float("-inf")
    tMM, tMI, tII, tIM = transition_probs(gap_open_phred, gap_ext_phred)
    tMD, tDD, tDM = tMI, tII, tIM
    err = 10.0 ** (-np.asarray(qual_phred, np.float64) / 10.0)

    M = np.zeros((m + 1, n + 1))
    I = np.zeros((m + 1, n + 1))
    D = np.zeros((m + 1, n + 1))
    D[0, :] = 1.0 / n
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            prior = 1.0 - err[i - 1] if read[i - 1] == hap[j - 1] \
                else err[i - 1] / 3.0
            M[i, j] = prior * (tMM * M[i - 1, j - 1]
                               + tIM * I[i - 1, j - 1]
                               + tDM * D[i - 1, j - 1])
            I[i, j] = tMI * M[i - 1, j] + tII * I[i - 1, j]
            D[i, j] = tMD * M[i, j - 1] + tDD * D[i, j - 1]
    total = float(M[m, 1:].sum() + I[m, 1:].sum())
    return float(np.log10(total)) if total > 0 else float("-inf")


LL_FLOOR = -300.0  # per-read log10 floor: even float64 can underflow to -inf
# (a read mismatching both haplotypes badly enough); flooring keeps the
# genotype algebra finite — a read that explains NEITHER haplotype carries
# no genotype information, so the exact value below the floor is irrelevant


def genotype_likelihoods(read_ll_ref: np.ndarray, read_ll_alt: np.ndarray,
                         ) -> tuple[float, float, float]:
    """Diploid genotype log10-likelihoods (RR, RA, AA) from per-read
    log10 P(read|ref-hap) and P(read|alt-hap) (GATK's model: each read drawn
    from one of the two genotype haplotypes with probability 1/2)."""
    ref = np.maximum(np.asarray(read_ll_ref, np.float64), LL_FLOOR)
    alt = np.maximum(np.asarray(read_ll_alt, np.float64), LL_FLOOR)
    rr = float(ref.sum())
    aa = float(alt.sum())
    # log10((10^ref + 10^alt) / 2) per read, summed — stable via max-factoring
    hi = np.maximum(ref, alt)
    lo = np.minimum(ref, alt)
    ra = float((hi + np.log10(1.0 + 10.0 ** (lo - hi)) - LOG10_2).sum())
    return rr, ra, aa
