"""Build the native host-runtime library with the system toolchain.

No pip/pybind11 in this environment (and none needed): plain C ABI +
ctypes. `python -m tpu3d.native.build` compiles trackstore.cpp into
_trackstore.so next to it; tpu3d.native loads it lazily and falls back to
the pure-Python implementations when the library (or a compiler) is
absent.
"""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "trackstore.cpp")
OUT = os.path.join(HERE, "_trackstore.so")


def build(verbose: bool = True) -> str:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", SRC, "-o", OUT]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


def ensure_built() -> str | None:
    """Build if missing or stale; return the .so path or None."""
    try:
        if (not os.path.exists(OUT)
                or os.path.getmtime(OUT) < os.path.getmtime(SRC)):
            build(verbose=False)
        return OUT
    except (OSError, subprocess.CalledProcessError):
        return None


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
    sys.exit(0)
