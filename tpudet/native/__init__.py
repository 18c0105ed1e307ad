"""Native (C++) host-side components, bound via ctypes.

The compute path of tpudet is JAX/XLA/Pallas; the host runtime around it —
here, the image front-end (JPEG decode + resize + canvas pad, SURVEY.md
C2/C4) — is C++ for throughput: Python/PIL costs ~11 ms/img serial, which a
~550 img/s/chip device rate turns into a ~6-core host budget. The native
batch decoder fuses the three stages per image (one pass, no intermediate
PIL objects) and threads across images inside one GIL-released call.

Builds lazily on first use (g++ -O3, links the system libjpeg) and caches
the .so under ~/.cache/tpudet keyed by the source hash. Everything degrades
gracefully: ``load_decoder()`` returns None when the toolchain or libjpeg is
missing, and callers fall back to the PIL path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_SRC = os.path.join(os.path.dirname(__file__), "decoder.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _cache_dir() -> str:
    root = os.environ.get("TPUDET_CACHE", "")
    if not root:
        root = os.path.join(
            os.environ.get("XDG_CACHE_HOME")
            or os.path.join(os.path.expanduser("~"), ".cache"),
            "tpudet",
        )
    os.makedirs(root, exist_ok=True)
    return root


def _host_tag() -> str:
    """CPU identity folded into the cache key: -march=native objects are
    ISA-specific, and a cached .so from a wider-ISA host (shared/NFS home,
    migrated VM image) would SIGILL here rather than fall back."""
    cpu = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():
                    break  # end of the first CPU's block; the rest repeat it
                # x86: "model name"/"flags"; aarch64: "CPU implementer"/
                # "CPU part"/"Features" (Features precedes the part lines,
                # so collect the whole first block rather than early-exit).
                if line.startswith(("model name", "flags", "CPU implementer",
                                    "CPU part", "Features")):
                    cpu += line
    except OSError:
        pass
    return hashlib.sha256((os.uname().machine + cpu).encode()).hexdigest()[:8]


def _build() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    digest += "_" + _host_tag()
    out = os.path.join(_cache_dir(), f"libtpudet_decoder_{digest}.so")
    if os.path.exists(out):
        return out
    tmp = out + f".tmp{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-funroll-loops",
        "-ffp-contract=fast", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", tmp, "-ljpeg",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            # Surface the compiler output: "failed to build" without it is
            # undiagnosable (e.g. missing libjpeg headers).
            raise RuntimeError(
                "native decoder build failed: "
                f"{' '.join(cmd)}\n{proc.stderr.strip()[-2000:]}"
            )
        os.replace(tmp, out)  # atomic under concurrent builders
    finally:
        if os.path.exists(tmp):  # failed build: no partial-object litter
            os.remove(tmp)
    return out


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int)
    szp = ctypes.POINTER(ctypes.c_size_t)
    lib.tpudet_jpeg_dims.argtypes = [u8p, ctypes.c_size_t, i32p, i32p]
    lib.tpudet_jpeg_dims.restype = ctypes.c_int
    lib.tpudet_decode_jpeg.argtypes = [
        u8p, ctypes.c_size_t, u8p, ctypes.c_size_t, i32p, i32p
    ]
    lib.tpudet_decode_jpeg.restype = ctypes.c_int
    lib.tpudet_decode_resize_pad.argtypes = [
        u8p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, u8p, i32p, i32p, i32p, i32p,
    ]
    lib.tpudet_decode_resize_pad.restype = ctypes.c_int
    lib.tpudet_decode_batch.argtypes = [
        u8p, szp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p, i32p,
    ]
    lib.tpudet_decode_batch.restype = ctypes.c_int
    lib.tpudet_resize.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int
    ]
    lib.tpudet_resize.restype = ctypes.c_int
    return lib


def load_decoder() -> Optional[ctypes.CDLL]:
    """Build (once) and load the native decoder; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            _lib = _bind(ctypes.CDLL(_build()))
        except (OSError, subprocess.CalledProcessError, FileNotFoundError):
            _load_failed = True
    return _lib


def native_available() -> bool:
    return load_decoder() is not None
