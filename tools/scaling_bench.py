"""Sharded-step scaling evidence on the virtual CPU mesh.

Real multi-chip hardware is not reachable from this machine, so this tool
measures the two things that ARE measurable locally and reports the model
that connects them to multi-chip efficiency (docs/PERFORMANCE.md "Scaling"):

1. Fixed-TOTAL-work step time on 1/2/4/8 virtual CPU devices.  All the
   virtual devices share the same 4 physical cores, so total compute time
   is ~constant across n; any growth in t(n) is the cost ADDED by the
   sharding machinery itself (collectives, funnel alignment, per-shard
   dispatch) — exactly the term that decides multi-chip efficiency.
2. The exact collective traffic of the compiled step, by parsing the
   compiled HLO: every all-reduce / all-gather / collective-permute /
   reduce-scatter op and its output bytes.

Each mesh size runs in a subprocess (the virtual device count must be set
before backend init).  Results -> tools/scaling_results.json.

Usage: python tools/scaling_bench.py
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

CHILD = r"""
import json, re, sys, time
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
n = int(sys.argv[1])

sys.path.insert(0, "/root/repo")
from imageencoder_tpu.models.video import mvec_bits
from imageencoder_tpu.parallel import make_mesh
from imageencoder_tpu.parallel.video_sharding import make_sharded_video_packed

assert jax.device_count() >= n, (jax.device_count(), n)
mesh = make_mesh(n)

# Fixed TOTAL work: 8 frames of 256x256, gop 4, merange 16 (raw-ref mode).
F, H, W, GOP, MER = 8, 256, 256, 4, 16
rng = np.random.default_rng(0)
frames = rng.integers(0, 256, size=(F, H, W), dtype=np.uint8)
quant = np.full((4, 4), 10.0, dtype=np.float32)

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
for _ in range(5):
    t0 = time.perf_counter()
    jax.block_until_ready(step(*args))
    best = min(best, time.perf_counter() - t0)

print(json.dumps({"n": n, "mesh": dict(mesh.shape), "step_s": best,
                  "collectives": coll}))
"""


def main() -> int:
    results = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # breaks axon plugin registration
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count={n}")
        env["JAX_PLATFORMS"] = "cpu"
        r = subprocess.run([sys.executable, "-c", CHILD, str(n)],
                           capture_output=True, text=True, timeout=600,
                           env=env)
        if r.returncode != 0:
            print(r.stdout + r.stderr, file=sys.stderr)
            return 1
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        results.append(rec)
        print(f"n={n} mesh={rec['mesh']} step={rec['step_s']*1e3:.1f} ms "
              f"collectives={rec['collectives']}")

    t1 = results[0]["step_s"]
    for rec in results:
        rec["overhead_vs_1dev_ms"] = round((rec["step_s"] - t1) * 1e3, 2)
    out = os.path.join(os.path.dirname(__file__), "scaling_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
