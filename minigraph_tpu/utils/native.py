"""Lazy builder/loader for the native host-runtime library (C).

The C sources live in <repo>/native/.  They are compiled on demand into
a shared library cached next to the sources; rebuilds happen when any
source is newer than the cached .so.  Loading is optional — every caller
has a pure-Python fallback — but the native path is the default for
speed and is required for large inputs.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parents[2]
_NATIVE_DIR = _REPO_ROOT / "native"
_SO_PATH = _NATIVE_DIR / "libmgt.so"

_lib = None
_tried = False


def _needs_build() -> bool:
    if not _SO_PATH.exists():
        return True
    so_mtime = _SO_PATH.stat().st_mtime
    for src in _NATIVE_DIR.glob("*.c"):
        if src.stat().st_mtime > so_mtime:
            return True
    for src in _NATIVE_DIR.glob("*.h"):
        if src.stat().st_mtime > so_mtime:
            return True
    return False


def build() -> bool:
    # *_selftest.c is the standalone ASan harness, not library code
    srcs = sorted(str(p) for p in _NATIVE_DIR.glob("*.c")
                  if not p.name.endswith("_selftest.c"))
    if not srcs:
        return False
    cmd = ["gcc", "-O3", "-march=native", "-funroll-loops", "-ffp-contract=off", "-shared", "-fPIC", "-o", str(_SO_PATH), *srcs, "-lm", "-lpthread", "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        sys.stderr.write(f"[mgt] native build failed: {e}\n")
        return False


def get_lib():
    """Return the loaded native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if _needs_build() and not build():
            return None
        # dlopen caches by path: a long-lived process that re-imports
        # this module after a rebuild would silently keep the OLD
        # library mapped (observed: a warm worker ran a stale
        # mgt_map_tail without the newest mode and produced subtly
        # different chains).  Load a per-mtime copy so every rebuild
        # maps fresh code.
        import shutil
        # per-user 0700 cache dir (NOT the shared /tmp root: a
        # predictable world-writable path could be pre-seeded by
        # another user and dlopen'd as their code)
        cdir = Path(os.environ.get("XDG_CACHE_HOME",
                                   Path.home() / ".cache")) / "mgt"
        cdir.mkdir(mode=0o700, parents=True, exist_ok=True)
        if cdir.stat().st_uid != os.getuid():
            raise OSError(f"{cdir} not owned by this user")
        mt = int(_SO_PATH.stat().st_mtime_ns)
        vpath = cdir / f"libmgt-{mt}.so"
        if not vpath.exists():
            tmp = vpath.with_suffix(".tmp%d" % os.getpid())
            shutil.copy2(_SO_PATH, tmp)
            os.replace(tmp, vpath)
        for old in cdir.glob("libmgt-*.so"):
            if old != vpath:
                try:
                    old.unlink()
                except OSError:
                    pass
        _lib = ctypes.CDLL(str(vpath))
        _configure(_lib)
    except OSError as e:
        sys.stderr.write(f"[mgt] native load failed: {e}\n")
        _lib = None
    return _lib


def _configure(lib) -> None:
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.mgt_radix_argsort_u64.restype = None
    lib.mgt_radix_argsort_u64.argtypes = [u64p, u64p, ctypes.c_int64]
    lib.mgt_radix_sort_128x.restype = None
    lib.mgt_radix_sort_128x.argtypes = [u64p, ctypes.c_int64]
    for name in ("mgt_lchain_dp", "mgt_lchain_rmq", "mgt_wfa_score"):
        if hasattr(lib, name):
            pass  # signatures configured by their Python wrappers
