"""Host monitor supervisor: external observers for long runs.

Re-creates the reference's monitor fleet (`smith_waterman/src/perf_logger.rs`):
spawn system monitors writing to ``logs/run_N/`` for the duration of a run
(`perf_logger.rs:74-168`), kill them on stop (`perf_logger.rs:170-206`), and
clean up on Ctrl-C (`perf_logger.rs:271-281`).

Differences: the GPU monitor (``nvidia-smi dmon``) is replaced by a JAX
device-memory sampler thread (TPU has no dmon equivalent on this host), and
missing monitor binaries are skipped gracefully instead of failing the run.
All monitors are off the critical path (SURVEY.md §7.6).
"""

from __future__ import annotations

import contextlib
import json
import os
import signal
import subprocess
import threading
import time

MONITOR_CMDS = {
    # name -> argv (perf_logger.rs:95-135 equivalents)
    "iostat": ["iostat", "-dx", "1"],
    "vmstat": ["vmstat", "1"],
    "pidstat": ["pidstat", "-w", "1"],
}


def _next_run_dir(base: str = "logs") -> str:
    os.makedirs(base, exist_ok=True)
    n = 1
    while os.path.exists(os.path.join(base, f"run_{n}")):
        n += 1
    path = os.path.join(base, f"run_{n}")
    os.makedirs(path)
    return path


class SystemMonitors:
    """Spawn/stop external monitors + a device-memory sampler."""

    def __init__(self, log_base: str = "logs", sample_interval_s: float = 1.0):
        self.log_base = log_base
        self.sample_interval_s = sample_interval_s
        self.run_dir: str | None = None
        self._procs: dict[str, subprocess.Popen] = {}
        self._stop_event = threading.Event()
        self._sampler: threading.Thread | None = None

    def start(self) -> str:
        self.run_dir = _next_run_dir(self.log_base)
        for name, argv in MONITOR_CMDS.items():
            log = open(os.path.join(self.run_dir, f"{name}.log"), "w")
            try:
                self._procs[name] = subprocess.Popen(
                    argv, stdout=log, stderr=subprocess.STDOUT
                )
            except FileNotFoundError:
                log.write(f"{argv[0]} not available on this host\n")
                log.close()
        self._stop_event.clear()
        self._sampler = threading.Thread(target=self._sample_device, daemon=True)
        self._sampler.start()
        return self.run_dir

    def _sample_device(self) -> None:
        """Device-memory sampler — the nvidia-smi dmon analogue
        (perf_logger.rs:77-82)."""
        assert self.run_dir is not None
        path = os.path.join(self.run_dir, "device_memory.jsonl")
        try:
            import jax

            devs = jax.devices()
        except Exception:
            devs = []
        with open(path, "w") as f:
            while not self._stop_event.wait(self.sample_interval_s):
                row = {"t": time.time()}
                for d in devs:
                    try:
                        stats = d.memory_stats() or {}
                        row[str(d.id)] = {
                            "bytes_in_use": stats.get("bytes_in_use"),
                            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                        }
                    except Exception:
                        pass
                f.write(json.dumps(row) + "\n")
                f.flush()

    def stop(self) -> None:
        self._stop_event.set()
        if self._sampler is not None:
            self._sampler.join(timeout=2)
        for name, proc in self._procs.items():
            with contextlib.suppress(ProcessLookupError):
                proc.terminate()
            try:
                proc.wait(timeout=2)
            except subprocess.TimeoutExpired:
                with contextlib.suppress(ProcessLookupError):
                    proc.kill()
        self._procs.clear()


@contextlib.contextmanager
def system_monitors(log_base: str = "logs"):
    """Context manager + SIGINT cleanup (perf_logger.rs:271-281)."""
    mon = SystemMonitors(log_base=log_base)
    mon.start()
    prev = signal.getsignal(signal.SIGINT)

    def handler(signum, frame):
        mon.stop()
        if callable(prev):
            prev(signum, frame)
        else:
            raise KeyboardInterrupt

    try:
        signal.signal(signal.SIGINT, handler)
    except ValueError:
        prev = None  # non-main thread: no signal hook
    try:
        yield mon
    finally:
        mon.stop()
        if prev is not None:
            with contextlib.suppress(ValueError):
                signal.signal(signal.SIGINT, prev)
