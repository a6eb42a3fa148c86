"""Device mesh construction and multi-host bring-up."""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"  # read-batch (data-parallel) axis
SEQ_AXIS = "seq"  # sequence-position (sequence-parallel) axis


def initialize_distributed() -> bool:
    """Multi-host bring-up via jax.distributed, driven by env vars.

    Call once per process on a pod slice. Controlled by standard JAX envs
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) so single-
    host runs need nothing. Returns True if distributed mode was initialized.
    """
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coord:
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]),
    )
    return True


def make_mesh(shape: tuple[int, ...] | None = None,
              axis_names: tuple[str, ...] | None = None,
              devices: list | None = None) -> Mesh:
    """Build a mesh over all devices.

    shape=None: all devices on the data axis — the right default for this
    workload, where reads are embarrassingly parallel and collectives only
    merge scalars/histograms.
    shape=(d, s): 2-D (data, seq) mesh; the seq axis serves sequence-parallel
    scoring of very long sequences (halo-free Kadane monoid merges).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if shape is None or shape == ():
        shape = (n,)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    if axis_names is None:
        axis_names = (DATA_AXIS, SEQ_AXIS)[: len(shape)]
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def pad_to_shards(n: int, num_shards: int, multiple: int = 1) -> int:
    """Round n up so it divides evenly into num_shards * multiple."""
    q = num_shards * multiple
    return -(-n // q) * q
