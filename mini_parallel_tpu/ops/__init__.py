"""Compute ops: encoders, alignment scorers, k-mer kernels.

Pure-JAX reference implementations live next to their Pallas TPU kernels;
every Pallas kernel is validated against the pure-JAX/NumPy goldens in
``tests/``.
"""
