"""Native (C++) runtime components, built on demand with the system g++.

The TPU compute path is JAX/Pallas; the host runtime around it — format
codecs (XTC), fast parsers — is C++ compiled into a shared library and
bound via ctypes (the counterpart of mdlib's C core in the reference).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))


def _lib_path(name: str) -> str:
    return os.path.join(_DIR, f"lib{name}.so")


def build_library(name: str, sources: list[str], force: bool = False) -> str:
    """Compile sources into lib<name>.so if missing/stale; return path."""
    out = _lib_path(name)
    srcs = [os.path.join(_DIR, s) for s in sources]
    if not force and os.path.exists(out):
        newest = max(os.path.getmtime(s) for s in srcs)
        if os.path.getmtime(out) >= newest:
            return out
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", out, *srcs,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"native build failed for {name}:\n{proc.stderr[:2000]}"
        )
    return out


_cache: dict[str, ctypes.CDLL] = {}


def load_library(name: str, sources: list[str]) -> ctypes.CDLL:
    if name not in _cache:
        _cache[name] = ctypes.CDLL(build_library(name, sources))
    return _cache[name]
