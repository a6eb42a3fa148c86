"""True multi-process distributed test: 2 JAX processes over a local
coordinator (CPU backend), running the full distributed WGS path with a real
process_allgather merge — the simulated-pod test SURVEY.md §4 calls for.

Spawned as subprocesses because jax.distributed.initialize is once-per-
process; each worker writes its merged totals to a JSON file the parent
asserts on. Skips gracefully if the distributed service can't bind (some
sandboxes forbid listening sockets).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import pytest

from mini_parallel_tpu.io import fastq
from tests.conftest import random_dna

_WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")

from mini_parallel_tpu.models.alignment import AlignmentEngine
from mini_parallel_tpu.parallel import distributed
from mini_parallel_tpu.utils.config import Config

out_path = sys.argv[1]
cfg = Config(
    wgs_data_dir=os.environ["T_DIR"], sample_id="MP", lanes=4,
    reads_per_lane=1, chunk_size_reads=5, read_pad=64,
)
eng = AlignmentEngine(cfg, mode="kadane")
results, merged = distributed.process_full_wgs_distributed(
    eng, cfg, checkpoint_dir=os.environ["T_DIR"], echo=lambda *_: None
)
json.dump(
    {
        "pid": jax.process_index(),
        "nproc": jax.process_count(),
        "local_files": len(results),
        "files": merged.files,
        "reads": merged.reads,
        "bases": merged.bases,
        "score": merged.score,
    },
    open(out_path, "w"),
)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_wgs(tmp_path, rng):
    reads = [random_dna(rng, 300) for _ in range(10)]
    for lane in range(1, 5):
        fastq.write_fastq(
            str(tmp_path / f"MP_L{lane:03d}_R1_001.fastq.gz"), reads
        )
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            T_DIR=str(tmp_path),
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=os.pathsep.join(
                [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
                + sys.path
            ),
        )
        # workers must not inherit the forced single-process test mesh
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker), str(tmp_path / f"out{pid}.json")],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            )
        )
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (so, se) in zip(procs, outs):
        if p.returncode != 0:
            msg = se.decode(errors="replace")[-2000:]
            if "UNAVAILABLE" in msg or "bind" in msg.lower():
                pytest.skip(f"distributed service unavailable: {msg[-200:]}")
            raise AssertionError(f"worker failed:\n{msg}")

    results = [
        json.load(open(tmp_path / f"out{pid}.json")) for pid in range(2)
    ]
    for r in results:
        assert r["nproc"] == 2
        # global merged totals are identical on every host
        assert r["files"] == 4
        assert r["reads"] == 40
        assert r["bases"] == 12000
        assert r["score"] == 16  # 2 per >=1000-base chunk, 2 chunks/file
    # the 4 files were actually partitioned across the two processes
    assert results[0]["local_files"] + results[1]["local_files"] == 4
    assert {results[0]["pid"], results[1]["pid"]} == {0, 1}
