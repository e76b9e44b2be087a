"""Test harness config: run everything on a virtual 8-device CPU mesh.

SURVEY.md §4: the TPU-native analogue of a fake distributed backend is
``xla_force_host_platform_device_count`` — sharded steps must run (and agree
with single-device) without real chips.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")
