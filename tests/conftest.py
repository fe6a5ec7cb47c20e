"""Test configuration: run everything on XLA-CPU with 8 virtual devices.

This substitutes for the reference's missing test suite (SURVEY.md §4): unit
tests run without a TPU, and distributed tests simulate an 8-chip mesh via
--xla_force_host_platform_device_count.

A persistent compilation cache is enabled because this box has a single
CPU core: first run compiles (~minutes for the model zoo), reruns are
near-instant.
"""

import os

# IRR_TPU_TEST_ON_TPU=1 keeps the session's real backend (for the
# convergence/training-quality gate, .claude/skills/verify/SKILL.md);
# everything else runs on the 8-device virtual CPU mesh.
_USE_TPU = os.environ.get("IRR_TPU_TEST_ON_TPU", "0") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The host's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already baked into the config — the env var set above
# is too late, so force the platform through the config API.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
