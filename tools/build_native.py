"""Build the native C++ components (libpyvisim_io.so).

Usage: python tools/build_native.py
"""
from __future__ import annotations

import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).parent.parent
SRC = ROOT / "native" / "image_loader.cpp"
OUT = ROOT / "pyvisim_tpu" / "io" / "libpyvisim_io.so"


def main() -> None:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        str(SRC),
        "-o",
        str(OUT),
        "-ljpeg",
        "-lpthread",
    ]
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    print(f"built {OUT}")


if __name__ == "__main__":
    sys.exit(main())
