import numpy as np
import pytest

from mini_parallel_tpu.io import fastq
from mini_parallel_tpu.models.alignment import AlignmentEngine
from mini_parallel_tpu.parallel import distributed
from mini_parallel_tpu.utils.config import Config
from tests.conftest import random_dna


def test_shard_files_round_robin():
    files = [f"f{i}" for i in range(16)]
    shards = [distributed.shard_files(files, p, 3) for p in range(3)]
    assert sorted(sum(shards, [])) == sorted(files)  # exact partition
    assert [len(s) for s in shards] == [6, 5, 5]
    assert shards[0][:2] == ["f0", "f3"]  # interleaved, not block-split


def test_shard_files_single_process_identity():
    files = ["a", "b"]
    assert distributed.shard_files(files, 0, 1) == files


def test_merge_totals_single_process():
    t = distributed.DistributedTotals(2, 10, 100, 4, 1.5)
    assert distributed.merge_totals(t) == t


def test_distributed_wgs_single_process(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = Config(wgs_data_dir=str(tmp_path), sample_id="D", lanes=2,
                 reads_per_lane=1, chunk_size_reads=5, read_pad=64)
    reads = [random_dna(rng, 300) for _ in range(10)]
    for lane in (1, 2):
        fastq.write_fastq(str(tmp_path / f"D_L{lane:03d}_R1_001.fastq.gz"), reads)
    eng = AlignmentEngine(cfg, mode="kadane")
    results, merged = distributed.process_full_wgs_distributed(
        eng, cfg, checkpoint_dir=str(tmp_path), echo=lambda *_: None
    )
    assert merged.files == 2
    assert merged.reads == 20
    assert merged.bases == 6000
    assert merged.score == 8
