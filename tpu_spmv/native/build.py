"""Build the native runtime library: ``python -m tpu_spmv.native.build``.

Compiles ``native.cc`` into ``libtpu_spmv_native.so`` next to this file
with g++ (no external dependencies).  The Python layer falls back to NumPy
implementations when the library is absent, so building is optional but
recommended for large-matrix plan construction and CPU-oracle speed.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "native.cc")
OUT = os.path.join(HERE, "libtpu_spmv_native.so")


def build(verbose: bool = True) -> str:
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-march=native", "-ffp-contract=off", "-std=c++17",
        "-shared", "-fPIC",
        SRC, "-o", OUT,
    ]
    if verbose:
        print(" ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
    print(OUT)
