"""Test configuration: run everything on XLA-CPU with 8 virtual devices.

This substitutes for the reference's missing test suite (SURVEY.md §4): unit
tests run without a TPU, and distributed tests simulate an 8-chip mesh via
--xla_force_host_platform_device_count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
