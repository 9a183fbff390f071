"""Build the native C++ runtime shared library."""

from __future__ import annotations

import pathlib
import subprocess

HERE = pathlib.Path(__file__).parent / "native"


def build(verbose: bool = False) -> pathlib.Path:
    src = HERE / "runtime.cpp"
    out = HERE / "libier_runtime.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           str(src), "-o", str(out)]
    subprocess.run(cmd, check=True, capture_output=not verbose)
    return out


if __name__ == "__main__":
    print(build(verbose=True))
