"""Build the native IO library (g++ -> libnwio.so).

Run directly (`python -m neighborhoodwatch_tpu.native.build`) or let the
ctypes wrapper auto-build on first use. The build is a single translation
unit with no dependencies beyond pthreads, so a cached .so is rebuilt only
when nwio.cpp is newer.
"""

import os
import shutil
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "nwio.cpp")
LIB = os.path.join(_HERE, "libnwio.so")


def build(force: bool = False, quiet: bool = True) -> str | None:
    """Compile libnwio.so; returns its path, or None if no toolchain."""
    if not force and os.path.exists(LIB) and \
            os.path.getmtime(LIB) >= os.path.getmtime(SRC):
        return LIB
    gxx = shutil.which("g++") or shutil.which("clang++")
    if gxx is None:
        return None
    cmd = [gxx, "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           "-Wall", "-o", LIB, SRC]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return None
    if proc.returncode != 0:
        if not quiet:
            sys.stderr.write(proc.stderr)
        return None
    return LIB


if __name__ == "__main__":
    path = build(force="--force" in sys.argv, quiet=False)
    if path is None:
        print("build failed (no toolchain or compile error)", file=sys.stderr)
        sys.exit(1)
    print(path)
