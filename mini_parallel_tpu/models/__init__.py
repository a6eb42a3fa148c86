"""Workload pipelines: alignment, k-mer counting, variant-call prep.

Each pipeline composes the device ops in ``ops/`` with the host data plane in
``io/`` and (optionally) a device mesh from ``parallel/``.
"""
