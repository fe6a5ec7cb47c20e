#!/usr/bin/env python
"""Preemption-resilient training supervisor.

Long curriculum runs on tunneled/preemptible TPU chips die for reasons
that have nothing to do with the training job (chip reclaim, tunnel
drop, transient RESOURCE_EXHAUSTED on a dying backend). This wrapper
keeps a run alive across those events:

    python scripts/supervise_train.py -- \
        python main.py --save experiments/run ... (no --checkpoint/--start_epoch)

 - launches the command as given for the first attempt;
 - on a non-zero exit, probes the accelerator (tiny jax program with a
   timeout) every --probe_interval seconds until it answers;
 - relaunches with `--checkpoint <save_dir> --start_epoch <resume_epoch>`
   where resume_epoch comes from <save_dir>/checkpoint_latest.json
   (written by the runtime with phase mid_epoch/trained/validated —
   see irr_tpu/runtime/loop.py);
 - stops on exit 0, when resume_epoch exceeds --total_epochs, or after
   --max_restarts. Rapid crashes with a healthy accelerator (3 in a row
   under --min_run_secs) abort: that is a bug, not a preemption;
 - watches for STALLS: a dead device tunnel can hang the child at
   backend init forever instead of crashing it. If nothing under the
   save dir changes for --stall_timeout seconds, the child is killed
   and treated like a crash.

The reference has no equivalent (its runs assume a stable local GPU);
this is TPU-fleet operational plumbing.
"""

import argparse
import json
import os
import subprocess
import sys
import time


def _arg_value(cmd, flag):
    for i, a in enumerate(cmd):
        if a == flag and i + 1 < len(cmd):
            return cmd[i + 1]
        if a.startswith(flag + "="):
            return a.split("=", 1)[1]
    return None


def _probe_device(timeout):
    """True if the accelerator compiles+runs a trivial program in time."""
    code = "import jax, jax.numpy as jnp; print(float((jnp.ones((4,)) * 3)[0]))"
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                           stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _newest_mtime(save_dir):
    newest = 0.0
    if os.path.isdir(save_dir):
        for name in os.listdir(save_dir):
            try:
                newest = max(newest, os.path.getmtime(
                    os.path.join(save_dir, name)))
            except OSError:
                pass
    return newest


def _run_watched(cmd, save_dir, stall_timeout):
    """Run cmd; kill it if the save dir shows no activity for stall_timeout."""
    proc = subprocess.Popen(cmd)
    started = time.time()
    while True:
        try:
            return proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            pass
        last = max(_newest_mtime(save_dir), started)
        if time.time() - last > stall_timeout:
            print(f"[supervise] no activity under {save_dir} for "
                  f"{stall_timeout:.0f}s: killing stalled child", flush=True)
            proc.kill()
            proc.wait()
            return -9


def _resume_epoch(save_dir):
    stats = os.path.join(save_dir, "checkpoint_latest.json")
    if not os.path.isfile(stats):
        return None
    with open(stats) as f:
        d = json.load(f)
    if "resume_epoch" in d:
        return int(d["resume_epoch"])
    if "epoch" in d:  # older sidecar without the marker: epoch was validated
        return int(d["epoch"]) + 1
    return None


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--max_restarts", type=int, default=50)
    ap.add_argument("--probe_interval", type=float, default=180.0,
                    help="seconds between accelerator probes while down")
    ap.add_argument("--probe_timeout", type=float, default=240.0,
                    help="device-probe timeout; a degraded-but-alive tunnel "
                         "measures up to ~160s backend init (r3), and a "
                         "too-tight probe reads it as down forever")
    ap.add_argument("--min_run_secs", type=float, default=300.0,
                    help="a crash before this, with a healthy device, counts "
                         "toward the rapid-crash abort (3 strikes)")
    ap.add_argument("--stall_timeout", type=float, default=1800.0,
                    help="kill the child if nothing under --save changes for "
                         "this long (resident-set upload + cold compile can "
                         "legitimately take ~15 min; default 30 min)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- python main.py --save DIR ...")
    args = ap.parse_args()

    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (use: supervise_train.py -- python main.py ...)")
    # Base --checkpoint/--start_epoch (curriculum warm starts) are fine:
    # resume flags are APPENDED, and argparse keeps the last occurrence,
    # so an in-stage resume overrides the warm start.
    save_dir = _arg_value(cmd, "--save") or _arg_value(cmd, "-s")
    if not save_dir:
        ap.error("command must include --save DIR (resume state lives there)")
    total_epochs = int(_arg_value(cmd, "--total_epochs") or 10)

    rapid_crashes = 0
    for attempt in range(args.max_restarts + 1):
        run_cmd = list(cmd)
        resume = _resume_epoch(save_dir)
        if resume is not None:
            if resume > total_epochs:
                print(f"[supervise] resume_epoch {resume} > total_epochs "
                      f"{total_epochs}: run is complete", flush=True)
                return 0
            run_cmd += ["--checkpoint", save_dir,
                        "--checkpoint_mode", "resume_from_latest",
                        "--start_epoch", str(resume),
                        "--checkpoint_resume_optimizer", "True"]
        print(f"[supervise] attempt {attempt}: {' '.join(run_cmd)}", flush=True)
        t0 = time.time()
        rc = _run_watched(run_cmd, save_dir, args.stall_timeout)
        elapsed = time.time() - t0
        if rc == 0:
            # trust exit 0 only if the checkpoints agree the run reached the
            # end: main.py also exits 0 when a dataset fails to load
            done = _resume_epoch(save_dir)
            if done is not None and done > total_epochs:
                print(f"[supervise] finished cleanly after {elapsed:.0f}s",
                      flush=True)
                return 0
            print(f"[supervise] exit 0 but the checkpoint sidecar says "
                  f"resume_epoch={done} (need > {total_epochs}): treating "
                  f"as a failure", flush=True)
            rc = 1
        print(f"[supervise] exited rc={rc} after {elapsed:.0f}s", flush=True)
        device_ok = _probe_device(args.probe_timeout)
        if device_ok and elapsed < args.min_run_secs:
            rapid_crashes += 1
            if rapid_crashes >= 3:
                print("[supervise] 3 rapid crashes with a healthy device: "
                      "aborting (bug, not preemption)", flush=True)
                return rc
        else:
            rapid_crashes = 0
        while not device_ok:
            print(f"[supervise] device down; next probe in "
                  f"{args.probe_interval:.0f}s", flush=True)
            time.sleep(args.probe_interval)
            device_ok = _probe_device(args.probe_timeout)
        print("[supervise] device alive; resuming", flush=True)
    print(f"[supervise] gave up after {args.max_restarts} restarts", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
