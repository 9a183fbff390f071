"""Sharded-step scaling evidence on the virtual CPU mesh.

Real multi-chip hardware is not reachable from this machine (one tunneled
TPU chip), so this tool measures what IS measurable locally and reports
the model that connects it to multi-chip efficiency
(docs/PERFORMANCE.md "Scaling"):

1. WEAK scaling: constant per-device work (one GOP of 256x256 frames per
   frame-shard), total work grows with the mesh.  All n virtual devices
   share the same C physical cores, so the ideal wall time is
   t1 * total_work(n) / work(1) / min(n, C) — the measured/ideal ratio is
   the parallel efficiency net of everything the sharding machinery adds
   (collectives, funnel alignment, per-shard dispatch).
2. STRONG scaling: fixed total work across 1/2/4/8 devices (the round-3
   measurement, kept for continuity).
3. The exact collective traffic of each compiled step, by parsing the
   compiled HLO — the term that scales differently on a real pod, where
   it rides ICI instead of shared memory.  The analytic projection:
   per-step collective bytes / ICI bandwidth vs per-device compute time.

Each mesh size runs in a subprocess (the virtual device count must be set
before backend init).  Results -> tools/scaling_results.json.

Usage: python tools/scaling_bench.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, re, sys, time
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
n = int(sys.argv[1])
mode = sys.argv[2]  # "weak" | "strong"

sys.path.insert(0, "/root/repo")
from imageencoder_tpu.models.video import mvec_bits
from imageencoder_tpu.parallel import make_mesh
from imageencoder_tpu.parallel.video_sharding import make_sharded_video_packed

assert jax.device_count() >= n, (jax.device_count(), n)

GOP, MER, H, W = 4, 16, int(os.environ.get("SB_H", 256)), int(os.environ.get("SB_W", 256))
rng = np.random.default_rng(0)
quant = np.full((4, 4), 10.0, dtype=np.float32)

if mode == "weak":
    # Constant per-device work: one GOP per frame-shard, no stripe split
    # (block axis 1) so per-device work is exactly n-independent.
    mesh = make_mesh(n, frame_axis=n)
    F = GOP * n
else:
    mesh = make_mesh(n)
    F = 8
frames = rng.integers(0, 256, size=(F, H, W), dtype=np.uint8)

step = make_sharded_video_packed(mesh, GOP, MER, mvec_bits(MER))
args = (frames, quant, np.int32(64))
out = jax.block_until_ready(step(*args))

# Collective traffic from the compiled HLO (output bytes per collective).
DT = {"f32": 4, "s32": 4, "u32": 4, "s64": 8, "u64": 8, "f64": 8,
      "u8": 1, "s8": 1, "pred": 1, "bf16": 2, "f16": 2, "s16": 2, "u16": 2}
hlo = jax.jit(step).lower(*args).compile().as_text()
coll = {}
for mcoll in re.finditer(
        r"= \(?([a-z0-9]+)\[([0-9,]*)\][^=]*?"
        r"(all-reduce|all-gather|collective-permute|reduce-scatter)"
        r"(?:-start)?\(", hlo):
    dt, dims, op = mcoll.group(1), mcoll.group(2), mcoll.group(3)
    elems = 1
    for d in dims.split(","):
        if d:
            elems *= int(d)
    nbytes = elems * DT.get(dt, 4)
    ent = coll.setdefault(op, [0, 0])
    ent[0] += 1
    ent[1] += nbytes

best = 1e9
for _ in range(7):
    t0 = time.perf_counter()
    jax.block_until_ready(step(*args))
    best = min(best, time.perf_counter() - t0)

print(json.dumps({"n": n, "mode": mode, "mesh": dict(mesh.shape),
                  "frames": int(F), "step_s": best, "collectives": coll}))
"""


def _run(n: int, mode: str, hw: int = 256) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # breaks axon plugin registration
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count={n}")
    env["JAX_PLATFORMS"] = "cpu"
    env["SB_H"] = env["SB_W"] = str(hw)
    cmd = [sys.executable, "-c", CHILD, str(n), mode]
    if mode == "weak":
        # Pin the process to min(n, cores) CPUs so the shared-core weak
        # model is exact: without pinning, the 1-device baseline uses
        # XLA's intra-op threading across all cores and the ideal-time
        # denominator is wrong.
        cores = os.cpu_count() or 1
        cpus = ",".join(str(c) for c in range(min(n, cores)))
        cmd = ["taskset", "-c", cpus] + cmd
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                       env=env)
    if r.returncode != 0:
        raise RuntimeError(r.stdout + r.stderr)
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> int:
    cores = os.cpu_count() or 1
    results = {"physical_cores": cores, "weak": [], "weak_256": [],
               "strong": []}

    # Weak scaling at two per-device working sets: 128x128 frames stay
    # cache-resident per core (the pod-faithful case — a real chip has its
    # own HBM), 256x256 additionally measures this one socket's shared
    # DRAM contention, which does NOT model a pod but is reported for
    # honesty.
    for key, hw in (("weak", 128), ("weak_256", 256)):
        for n in (1, 2, 4, 8):
            rec = _run(n, "weak", hw)
            results[key].append(rec)
            print(f"{key} n={n} mesh={rec['mesh']} frames={rec['frames']} "
                  f"step={rec['step_s'] * 1e3:.1f} ms "
                  f"collectives={rec['collectives']}")
        # Efficiency under the shared-core model: n virtual devices carry
        # n units of work on min(n, cores) pinned physical cores.
        t1 = results[key][0]["step_s"]
        for rec in results[key]:
            n = rec["n"]
            ideal = t1 * n / min(n, cores)
            rec["ideal_s"] = round(ideal, 4)
            rec["weak_efficiency"] = round(ideal / rec["step_s"], 3)

    for n in (1, 2, 4, 8):
        rec = _run(n, "strong", 256)
        results["strong"].append(rec)
        print(f"strong n={n} mesh={rec['mesh']} frames={rec['frames']} "
              f"step={rec['step_s'] * 1e3:.1f} ms "
              f"collectives={rec['collectives']}")
    t1s = results["strong"][0]["step_s"]
    for rec in results["strong"]:
        rec["overhead_vs_1dev_ms"] = round((rec["step_s"] - t1s) * 1e3, 2)

    # Analytic ICI projection for the 8-device weak point: on a real pod
    # the collectives ride ICI (v5e ~45 GB/s/link each way) instead of
    # shared memory; everything else is per-device-local.
    w8 = results["weak_256"][-1]
    coll_bytes = sum(v[1] for v in w8["collectives"].values())
    per_dev_compute = w8["step_s"] / (8 / min(8, cores))  # shared-core est.
    ici_s = coll_bytes / 45e9
    results["ici_projection"] = {
        "collective_bytes_per_step": int(coll_bytes),
        "ici_bytes_per_s": 45e9,
        "collective_s": round(ici_s, 6),
        "per_device_compute_s_est": round(per_dev_compute, 4),
        "projected_multichip_efficiency":
            round(per_dev_compute / (per_dev_compute + ici_s), 4),
    }
    print("weak efficiency (128, cache-resident):",
          [r["weak_efficiency"] for r in results["weak"]])
    print("weak efficiency (256, shared-DRAM artifact):",
          [r["weak_efficiency"] for r in results["weak_256"]])
    print("ICI projection:", results["ici_projection"])

    out = os.path.join(os.path.dirname(__file__), "scaling_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
