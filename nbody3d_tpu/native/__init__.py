"""Native (C) components, built on demand with the system compiler.

Two components (the reference itself is pure JS, SURVEY §2 — these are
the host-runtime pieces where Python-level loops are the bottleneck):

- ``_fastjson``: float32<->JSON array codec that makes reference-schema
  checkpoint export/import (util.js:160-263) practical at large N
  (~100 MB of JSON at 500k bodies).
- ``_raster``: the rasterizer's depth-resolve core (scatter-min of
  packed depth|rgb keys over per-body discs) — ~100x over
  ``np.minimum.at`` at viewer scale (render/rasterize.py).
- ``_fof``: the friends-of-friends group finder's spatial-hash +
  union-find core (analysis.py::fof_groups) — pointer-chasing and
  data-dependent branching, the canonical "host runtime, not device
  math" workload.

Everything here is optional — callers fall back to the pure-Python path
when no compiler is available.

Build: compiled once into ``<name>.<abi>.so`` next to the source at
first import (no pip / setuptools involvement); rebuilt automatically if
the .c file is newer than the .so.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))


def _build(name: str) -> str | None:
    src = os.path.join(_DIR, name + ".c")
    tag = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    so = os.path.join(_DIR, name + tag)
    try:
        if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
            return so
        cc = os.environ.get("CC", "cc")
        include = sysconfig.get_paths()["include"]
        # Unique temp name per process: concurrent builders (pytest-xdist,
        # parallel CLI runs) must not clobber each other's half-written
        # output; os.replace keeps the final install atomic either way.
        tmp = f"{so}.{os.getpid()}.tmp"
        cmd = [cc, "-O2", "-fPIC", "-shared", "-o", tmp, src, f"-I{include}"]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)
        return so
    except Exception:
        return None


def _load(name: str):
    so = _build(name)
    if so is None:
        return None
    try:
        spec = importlib.util.spec_from_file_location(
            f"nbody3d_tpu.native.{name}", so
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


fastjson = _load("_fastjson")  # None when no working compiler is present
raster = _load("_raster")  # native depth-resolve (render/rasterize.py)
fof = _load("_fof")  # native friends-of-friends core (analysis.py)


def dumps_f32(arr) -> bytes | None:
    """float32 ndarray -> JSON array bytes (json.dump-identical), or None
    when the native codec is unavailable or the data needs the slow path
    (non-finite values have different JSON spellings)."""
    import numpy as np

    if fastjson is None:
        return None
    a = np.ascontiguousarray(arr, dtype="<f4")
    if not np.isfinite(a).all():
        return None
    return fastjson.dumps_f32(a.reshape(-1).tobytes())


def scan_f32(buf: bytes, start: int):
    """Parse a JSON number array at ``buf[start] == '['``; returns
    ``(float32 ndarray, end_index)`` or None if unavailable."""
    import numpy as np

    if fastjson is None:
        return None
    data, end = fastjson.scan_f32(buf, start)
    return np.frombuffer(data, dtype="<f4"), end
