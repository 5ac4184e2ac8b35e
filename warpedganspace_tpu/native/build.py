"""Lazy g++ build + ctypes binding for the native host-side components."""
from __future__ import annotations

import ctypes
import hashlib
import os
import os.path as osp
import subprocess
import tempfile

_cached = None
_failed = False


def load_native():
    """Return the ctypes library, building it on first use; None if no
    toolchain is available (callers fall back to numpy)."""
    global _cached, _failed
    if _cached is not None or _failed:
        return _cached

    src = osp.join(osp.dirname(osp.abspath(__file__)), "sfd_post.cpp")
    try:
        with open(src, "rb") as f:
            digest = hashlib.sha1(f.read()).hexdigest()[:12]
        # Per-user cache with owner-only permissions: a shared, predictable
        # /tmp path would let another local user pre-plant a .so that we
        # would CDLL.
        cache_dir = os.environ.get(
            "WGS_NATIVE_CACHE",
            osp.join(tempfile.gettempdir(), f"wgs_native_{os.getuid()}"),
        )
        os.makedirs(cache_dir, mode=0o700, exist_ok=True)
        lib_path = osp.join(cache_dir, f"sfd_post_{digest}.so")
        if not osp.isfile(lib_path):
            # Unique tmp per process: concurrent first-use builds (parallel
            # test workers, train+eval jobs) must not interleave writes into
            # one tmp file and publish a corrupt library.
            tmp = f"{lib_path}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, src],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, lib_path)
        lib = ctypes.CDLL(lib_path)
        lib.wgs_nms.restype = ctypes.c_int
        lib.wgs_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_int),
        ]
        _cached = lib
    except Exception:
        _failed = True
        _cached = None
    return _cached
