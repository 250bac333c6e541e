"""Build the native video decode library: `python -m jepa_tpu.native.build`.

Compiles videodec.cpp against the system FFmpeg dev libraries into
libjepadec.so next to this file. Idempotent: skips when the .so is newer
than the source (use --force to rebuild).
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "videodec.cpp")
OUT = os.path.join(HERE, "libjepadec.so")
LIBS = ["avformat", "avcodec", "avutil", "swscale"]


def build(force: bool = False) -> str:
    if (
        not force
        and os.path.exists(OUT)
        and os.path.getmtime(OUT) >= os.path.getmtime(SRC)
    ):
        return OUT
    cmd = (
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", SRC, "-o", OUT]
        + [f"-l{l}" for l in LIBS]
    )
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build(force="--force" in sys.argv)
    print(f"built {OUT}")
