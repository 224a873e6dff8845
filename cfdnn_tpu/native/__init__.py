"""Native (C) runtime components, built on demand with a Python fallback.

The reference implements its IO layer in C++ (src/solver_vtk.cpp); this
package holds the TPU build's native equivalents. Extensions are compiled
lazily with the system compiler the first time they're requested and cached
next to the sources; every consumer must degrade gracefully to its NumPy
fallback when no compiler is available.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import sysconfig

_DIR = os.path.dirname(__file__)


def _find_built(stem: str):
    hits = glob.glob(os.path.join(_DIR, f"{stem}*.so"))
    return hits[0] if hits else None


def _build(stem: str, source: str) -> bool:
    cc = os.environ.get("CC", "cc")
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_DIR, stem + suffix)
    tmp = out + ".build"
    # compile to a temp name and rename on success so an interrupted build
    # never leaves a truncated .so that would silently disable the native
    # path forever
    cmd = [cc, "-O3", "-shared", "-fPIC",
           "-I", sysconfig.get_paths()["include"],
           os.path.join(_DIR, source), "-o", tmp]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if r.returncode == 0 and os.path.exists(tmp):
            os.replace(tmp, out)
            return True
        return False
    except (OSError, subprocess.TimeoutExpired):
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def load_vtkio():
    """Return the _vtkio extension module, building it if needed; None when
    unavailable (callers fall back to NumPy encoding)."""
    try:
        from . import _vtkio  # already built
        return _vtkio
    except ImportError:
        pass
    if _find_built("_vtkio") is None and not _build("_vtkio", "vtkio.c"):
        return None
    try:
        import importlib
        return importlib.import_module("cfdnn_tpu.native._vtkio")
    except ImportError:
        return None
