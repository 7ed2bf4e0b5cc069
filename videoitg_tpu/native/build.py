"""Build the native videodec shared library with g++ against libav.

Invoked lazily on first import of videoitg_tpu.data.video (and by
`python -m videoitg_tpu.native.build` explicitly). The .so is cached next
to the source and rebuilt when the source is newer.
"""

from __future__ import annotations

import os
import subprocess
import sys

SRC_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(SRC_DIR, "videodec.cpp")
LIB = os.path.join(SRC_DIR, "libvideodec.so")

PKGS = ["libavformat", "libavcodec", "libavutil", "libswscale"]


def _pkg_config(flag: str) -> list[str]:
    out = subprocess.check_output(["pkg-config", flag] + PKGS, text=True)
    return out.split()


def build(force: bool = False) -> str:
    if (
        not force
        and os.path.exists(LIB)
        and os.path.getmtime(LIB) >= os.path.getmtime(SRC)
    ):
        return LIB
    cmd = (
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", SRC, "-o", LIB]
        + _pkg_config("--cflags")
        + _pkg_config("--libs")
    )
    subprocess.check_call(cmd)
    return LIB


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
