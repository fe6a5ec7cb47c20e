#!/usr/bin/env bash
# Pre-warm the persistent XLA compile cache for the driver's multi-chip
# dryrun (MULTICHIP_r03 timed out at rc=124 because the full IRR_PWC train
# step takes ~6 min to compile cold on one CPU core; see VERDICT.md r3 #1).
#
# Runs __graft_entry__.dryrun_multichip with the driver's exact env
# (8 virtual CPU devices). The compiled executables land in
# .dryrun_xla_cache/ (repo-local, survives rounds), so the driver's own
# run compiles nothing and finishes in ~1-2 min.
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-8}"
XLA_FLAGS="--xla_force_host_platform_device_count=${N}" JAX_PLATFORMS=cpu \
  python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(${N})"
du -sh .dryrun_xla_cache
