"""Build the native C++ runtime shared library."""

from __future__ import annotations

import hashlib
import pathlib
import platform
import subprocess

HERE = pathlib.Path(__file__).parent / "native"


def _host_tag() -> str:
    """Fingerprint of the ISA the compiler will target with -march=native.

    The library is never shipped (gitignored + untracked): it is rebuilt on
    each host.  The tag guards against copying a built tree between machines
    — CDLL-ing an AVX-512 binary on an older host dies with an uncatchable
    SIGILL instead of the graceful Python fallback, so a tag mismatch forces
    a rebuild here.
    """
    flags = ""
    try:
        for line in pathlib.Path("/proc/cpuinfo").read_text().splitlines():
            if line.startswith(("flags", "Features")):
                flags = line.split(":", 1)[1]
                break
    except OSError:
        pass
    sig = platform.machine() + " " + " ".join(sorted(flags.split()))
    return hashlib.sha256(sig.encode()).hexdigest()[:16]


def build(verbose: bool = False) -> pathlib.Path:
    src = HERE / "runtime.cpp"
    out = HERE / "libier_runtime.so"
    tag = HERE / "libier_runtime.so.buildtag"
    host = _host_tag()
    if (out.exists() and out.stat().st_mtime >= src.stat().st_mtime
            and tag.exists() and tag.read_text().strip() == host):
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
    tag.write_text(host + "\n")
    return out


def build_sanitized(kind: str = "thread",
                    verbose: bool = False) -> pathlib.Path:
    """Build the -fsanitize={thread,address} instrumented driver binary.

    Links runtime.cpp with tools/sanitize_drive.cpp into a standalone
    executable — the sanitizer test gate (tests/test_sanitizers.py) runs
    it to vet the OpenMP chunk-parallel packers and the speculative
    Huffman FSM under TSAN/ASAN, the native concurrency analogue of the
    reference's Valgrind-driven fix (BitStream.cpp:16-19).  (Pure C++:
    Python under TSAN is ~100x slow and noisy.)
    """
    assert kind in ("thread", "address")
    src = HERE / "runtime.cpp"
    driver = HERE.parent.parent.parent / "tools" / "sanitize_drive.cpp"
    out = pathlib.Path("/tmp") / f"ier_drive_{kind[0]}san"
    if (out.exists() and out.stat().st_mtime >= src.stat().st_mtime
            and out.stat().st_mtime >= driver.stat().st_mtime):
        return out
    cmd = ["g++", "-O1", "-g", "-std=c++17", "-fopenmp",
           "-ffp-contract=off", f"-fsanitize={kind}", str(src), str(driver),
           "-o", str(out)]
    subprocess.run(cmd, check=True, capture_output=not verbose, timeout=300)
    return out


if __name__ == "__main__":
    print(build(verbose=True))
