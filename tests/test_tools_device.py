import io
import subprocess
import sys

from mini_parallel_tpu import device
from mini_parallel_tpu.io import fastq
from mini_parallel_tpu.tools import linecount


def test_device_enumeration():
    devs = device.get_devices()
    assert len(devs) == 8  # virtual CPU mesh from conftest
    assert all(d.platform == "cpu" for d in devs)


def test_accelerator_probe_cpu_mesh():
    assert device.is_accelerator_available() is False  # cpu-only in tests


def test_enable_compile_cache(tmp_path):
    assert device.enable_compile_cache(str(tmp_path / "cache")) is not None


def test_linecount_tool(tmp_path, rng, capsys):
    from tests.conftest import random_dna

    path = str(tmp_path / "x.fastq.gz")
    fastq.write_fastq(path, [random_dna(rng, 10)] * 7)
    assert linecount.main([path]) == 0
    assert "28 lines" in capsys.readouterr().out


def test_linecount_missing_file(capsys):
    assert linecount.main(["/nonexistent"]) == 1


def test_linecount_no_args(capsys):
    assert linecount.main([]) == 2


def test_stdin_linecount_subprocess():
    out = subprocess.run(
        [sys.executable, "-m", "mini_parallel_tpu.tools.stdin_linecount"],
        input=b"a\nb\nc\n", capture_output=True, cwd="/root/repo",
    )
    assert out.stdout.strip() == b"3"


def test_autotune_smoke(capsys):
    """Tiny sweep on the CPU backend: validates + reports + picks a winner."""
    from mini_parallel_tpu.tools import autotune

    rc = autotune.main(["--reads", "64", "--len", "24",
                        "--blocks", "128", "--unrolls", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "best: block=128 unroll=2" in out
    assert "MPT_SW_BLOCK=128" in out


def test_roofline_measures_on_cpu(monkeypatch):
    # tiny shapes so the CPU run is fast; validates the measurement plumbing
    from mini_parallel_tpu.tools import roofline

    monkeypatch.setattr(roofline, "CHAIN", 8)
    monkeypatch.setattr(roofline, "TILE", (64, 64))
    monkeypatch.setattr(roofline, "BLK", 32)
    monkeypatch.setattr(roofline, "READS", 32)
    monkeypatch.setattr(roofline, "READ_LEN", 24)
    monkeypatch.setattr(roofline, "PAD", 24)
    peak = roofline.measure_peak_chain()
    assert peak > 0
    gcups, positions, dt = roofline.measure_sw()
    assert gcups > 0 and positions > 0 and dt > 0
