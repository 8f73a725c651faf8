"""Native (C++) host-side components and their ctypes bindings.

Libraries are built lazily on first import with g++ (no pip deps); build
artifacts land in ``fmov_pose_tpu/native/_build``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_HERE, "_build")
_LOCK = threading.Lock()
_LIBS = {}


def _build_lib(name: str, sources, extra_flags=()) -> str:
    os.makedirs(_BUILD, exist_ok=True)
    out = os.path.join(_BUILD, f"lib{name}.so")
    srcs = [os.path.join(_HERE, s) for s in sources]
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if os.path.exists(out) and os.path.getmtime(out) >= newest_src:
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           *extra_flags, *srcs, "-o", out]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def load(name: str, sources, extra_flags=()) -> ctypes.CDLL:
    with _LOCK:
        if name not in _LIBS:
            _LIBS[name] = ctypes.CDLL(_build_lib(name, sources, extra_flags))
        return _LIBS[name]
