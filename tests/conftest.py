"""Test harness config: run everything on a virtual 8-device CPU mesh.

SURVEY.md §4: the TPU-native analogue of a fake distributed backend is
``xla_force_host_platform_device_count`` — sharded steps must run (and agree
with single-device) without real chips.

Note: this image's sitecustomize force-registers the axon TPU tunnel at
interpreter startup, ignoring ``JAX_PLATFORMS`` in the environment; the
post-import ``jax.config.update('jax_platforms', 'cpu')`` below overrides it
reliably as long as no backend has been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# NVFI_TEST_TPU=1 opts a pytest invocation back onto the real device (used by
# the TPU-only probes, e.g. tests/test_mosaic_probe.py — round 5 found the
# unconditional CPU override made that probe silently unreachable).
if os.environ.get("NVFI_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
