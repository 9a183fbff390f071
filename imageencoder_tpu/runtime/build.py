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
    # like the reference binary / numpy path (no FMA contraction; safe to
    # combine with -march=native, which only widens the independent-lane
    # vectorization of the extract/IDCT kernels).
    cmd = ["g++", "-O3", "-std=c++17", "-fopenmp", "-ffp-contract=off",
           "-march=native", "-shared", "-fPIC", str(src), "-o", str(out)]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
    except subprocess.CalledProcessError:
        cmd.remove("-march=native")  # exotic host: portable fallback
        subprocess.run(cmd, check=True, capture_output=not verbose)
    return out


if __name__ == "__main__":
    print(build(verbose=True))
