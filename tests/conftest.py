"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-chip sharding is validated on the
standard XLA host-platform simulation (SURVEY §4's fake-backend strategy).
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The TPU-tunnel jax plugin in this image ignores the JAX_PLATFORMS env var
# (verified: devices() returns the TPU regardless); the config knob works.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))
