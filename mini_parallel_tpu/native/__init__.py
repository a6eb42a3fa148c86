"""Native (C++) host data plane: auto-build + ctypes bindings.

Builds the shared libraries on first import if a C++ toolchain is present;
all callers fall back to the pure-Python paths when unavailable, so the
framework never hard-depends on the native plane.
"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))


def _ensure_built(lib: str) -> str | None:
    path = os.path.join(_DIR, lib)
    srcs = [os.path.join(_DIR, s) for s in
            ("fastq_reader.cpp", "kmer_store.cpp", "pack2bit.cpp")]
    if os.path.exists(path) and all(
        os.path.getmtime(path) >= os.path.getmtime(s) for s in srcs if os.path.exists(s)
    ):
        return path
    try:
        subprocess.run(
            ["make", "-C", _DIR, lib],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, FileNotFoundError):
        return path if os.path.exists(path) else None
    return path if os.path.exists(path) else None


def available() -> bool:
    return (
        _ensure_built("libfastq.so") is not None
        and _ensure_built("libkmerstore.so") is not None
    )
