"""Native host ops (C++): exact Hungarian assignment and IoU matrices.

Auto-builds the ``_hostops`` C extension on first import (setuptools
in-place build, cached next to the sources); falls back to the pure-Python
implementations in :mod:`vbt_tpu.tracking.assignment` /
:mod:`vbt_tpu.ops.postprocess` when no compiler is available.

Usage::

    from vbt_tpu.native import hostops
    if hostops is not None:
        cols = hostops.jv_assign(cost)
"""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(__file__)

hostops = None


def _try_import():
    global hostops
    try:
        from vbt_tpu.native import _hostops as hostops_mod
    except ImportError:
        return False
    hostops = hostops_mod
    return True


def build(verbose: bool = False) -> bool:
    """Compile the extension in place. Returns True on success."""
    result = subprocess.run(
        [sys.executable, os.path.join(_DIR, "build_ext.py")],
        capture_output=not verbose,
        cwd=_DIR,
    )
    if result.returncode != 0:
        return False
    return _try_import()


if not _try_import():  # pragma: no cover - exercised via build()
    build()
