"""Native host-side accelerators (C extensions), with graceful fallback.

Build lazily on first use: the extension compiles in-tree with the stock
toolchain (cc via setuptools); if compilation is unavailable the callers
fall back to the numpy implementations.
"""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
_fastpoints = None
_build_attempted = False


def _try_import():
    global _fastpoints
    if _DIR not in sys.path:
        sys.path.insert(0, _DIR)
    try:
        import _fastpoints as mod  # noqa: PLC0415

        _fastpoints = mod
    except ImportError:
        _fastpoints = None
    return _fastpoints


def _build() -> bool:
    """Compile fastpoints.c in-tree. Returns True on success."""
    import sysconfig

    src = os.path.join(_DIR, "fastpoints.c")
    if not os.path.exists(src):
        return False
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_DIR, "_fastpoints" + suffix)
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return True
    include = sysconfig.get_paths()["include"]
    cc = sysconfig.get_config_var("CC") or "cc"
    cmd = cc.split() + [
        "-O3", "-shared", "-fPIC", f"-I{include}", src, "-o", out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _stale() -> bool:
    """True when the built extension predates fastpoints.c (an old .so
    would import fine but miss newer functions). A missing source file
    (installed without sources) never counts as stale."""
    import sysconfig

    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_DIR, "_fastpoints" + suffix)
    src = os.path.join(_DIR, "fastpoints.c")
    return (
        os.path.exists(out)
        and os.path.exists(src)
        and os.path.getmtime(out) < os.path.getmtime(src)
    )


def get_fastpoints():
    """The _fastpoints module, (re)building it if needed; None if
    unavailable. A stale .so whose rebuild fails (no compiler, timeout)
    is still returned — callers hasattr-guard functions newer than it."""
    global _build_attempted
    if _fastpoints is not None:
        return _fastpoints
    if not _stale() and _try_import() is not None:
        return _fastpoints
    if not _build_attempted:
        _build_attempted = True
        if _build():
            mod = _try_import()
            if mod is not None:
                return mod
    return _try_import()
