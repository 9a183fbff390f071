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
    # -ffp-contract=off: dct_exact must round after every multiply exactly
    # like the reference binary / numpy path (no FMA contraction).
    cmd = ["g++", "-O3", "-std=c++17", "-fopenmp", "-ffp-contract=off",
           "-shared", "-fPIC", str(src), "-o", str(out)]
    subprocess.run(cmd, check=True, capture_output=not verbose)
    return out


if __name__ == "__main__":
    print(build(verbose=True))
