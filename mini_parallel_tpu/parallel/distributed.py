"""Multi-host WGS processing: file sharding + cross-process result merge.

The reference is strictly single-process/single-GPU; this module is the
pod-slice scaling path from BASELINE.json ("8 lanes x 2 reads of 50GB WGS
sharded across N>=2 hosts with merged scores/histograms", config 5):

- **file -> host assignment** is a static round-robin interleave: lane files
  have skewed sizes, and interleaving (rather than block-splitting) keeps
  per-host byte totals close (SURVEY.md §7's "hard parts" note).
- each process runs the standard orchestrator on its shard, with
  process-scoped checkpoint run IDs (independent resume per host),
- totals merge with ``multihost_utils.process_allgather`` — a single tiny
  all-gather over DCN at the end of the run; per-chunk work never crosses
  hosts, which is what makes >=80% linear reads/s scaling attainable.

Single-process degenerates to the local path, so all logic is testable
without a pod (plus simulated assignment tests in tests/test_distributed.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from mini_parallel_tpu.models.alignment import AlignmentEngine, FileResult
from mini_parallel_tpu.parallel.mesh import initialize_distributed
from mini_parallel_tpu.utils.config import Config


def shard_files(files: list[str], process_id: int, num_processes: int) -> list[str]:
    """Round-robin interleave (stable under skewed lane sizes)."""
    return [f for i, f in enumerate(files) if i % num_processes == process_id]


@dataclass
class DistributedTotals:
    files: int
    reads: int
    bases: int
    score: int
    seconds_max: float  # wall time = slowest host


def merge_totals(local: DistributedTotals) -> DistributedTotals:
    """All-gather per-host totals and reduce. Identity when single-process."""
    import jax

    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    vec = np.array(
        [local.files, local.reads, local.bases, local.score], dtype=np.int64
    )
    gathered = multihost_utils.process_allgather(vec)  # (n_proc, 4)
    secs = multihost_utils.process_allgather(
        np.array([local.seconds_max], dtype=np.float64)
    )
    f, r, b, s = gathered.sum(axis=0).tolist()
    return DistributedTotals(
        files=int(f), reads=int(r), bases=int(b), score=int(s),
        seconds_max=float(secs.max()),
    )


def process_full_wgs_distributed(
    engine: AlignmentEngine,
    cfg: Config | None = None,
    checkpoint_dir: str = ".",
    echo=print,
    retries: int = 0,
) -> tuple[list[FileResult], DistributedTotals]:
    """Run --full-wgs across all JAX processes; returns (local results,
    globally merged totals)."""
    import jax

    from mini_parallel_tpu.models.wgs import process_full_wgs_dataset

    initialize_distributed()  # idempotent; the CLI already ran it at startup
    pid, nproc = jax.process_index(), jax.process_count()
    files = cfg.wgs_file_list() if cfg else engine.cfg.wgs_file_list()
    my_files = shard_files(files, pid, nproc)
    echo(f"[host {pid}/{nproc}] processing {len(my_files)}/{len(files)} files")

    results = process_full_wgs_dataset(
        engine,
        cfg,
        checkpoint_dir=checkpoint_dir,
        echo=echo,
        files=my_files,
        retries=retries,
    )
    local = DistributedTotals(
        files=len(results),
        reads=sum(r.total_reads for r in results),
        bases=sum(r.total_bases for r in results),
        score=sum(r.score for r in results),
        seconds_max=sum(r.seconds for r in results),
    )
    merged = merge_totals(local)
    if pid == 0 and nproc > 1:
        echo(
            f"[global] files={merged.files} reads={merged.reads} "
            f"bases={merged.bases} score={merged.score}"
        )
    return results, merged
