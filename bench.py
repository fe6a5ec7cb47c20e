"""Benchmark: IRR-PWC image pairs/sec/chip at Sintel resolution (1024x436).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The north star (BASELINE.json) is >=5x the reference PyTorch IRR-PWC on an
A100. No A100 is reachable from this environment and the reference repo
publishes no throughput numbers, so the baseline constant below is an
ESTIMATE, derived in BASELINE.md ("Derivation of the A100 baseline
constant"): the eval forward measures 1.135 TFLOP/pair (XLA cost
analysis); eager-torch A100 utilization for this glue-heavy model is
realistically 5-15% of TF32 peak -> 7-21 pairs/s; 20.0 pins the top of
that band (generous to the reference). vs_baseline = value / 20.0.

Runs eval-mode forward (the metric's setting) with bf16 conv compute
(f32 accumulation), batched to fill the chip, on the one real TPU.

Default mode = the PRODUCTION serving configuration (approx_guidance
stride 2: measured zero EPE / −0.0005 F1 on trained checkpoints,
RESULTS.md "Final evaluation"); the metric string carries the
`[approx_guidance]` label. `--exact` times the reference-exact parity
path (27.5 pairs/s, the number reported through round 4).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_A100_PAIRS_PER_SEC = 20.0  # estimated reference throughput (see above)
H, W = 436, 1024
BATCH = 8
WARMUP = 3
ITERS = 10


def _make_sintel_tree(root, n_frames=33):
    """Synthesize a one-scene Sintel-layout tree at full resolution so the
    --with-loader mode exercises the REAL path: PNG decode -> pair chain ->
    batch stacking -> H2D -> jitted forward (+epe loss). Cached across runs."""
    scene = os.path.join(root, "clean", "alley_bench")
    flow = os.path.join(root, "flow", "alley_bench")
    occ = os.path.join(root, "occlusions_rev", "alley_bench")
    if os.path.isdir(scene) and len(os.listdir(scene)) >= n_frames:
        return
    from PIL import Image
    for d in (scene, flow, occ):
        os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    from irr_tpu.utils.flow_io import write_flo
    for i in range(1, n_frames + 1):
        # natural-image-like content (smooth + texture) so PNG decode cost
        # is representative, not the worst case of incompressible noise
        base = rng.rand(-(-H // 8), -(-W // 8), 3)
        img = np.kron(base, np.ones((8, 8, 1)))[:H, :W]
        img = np.clip(img + rng.rand(H, W, 3) * 0.12, 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(scene, "frame_%04d.png" % i))
        if i < n_frames:
            write_flo(os.path.join(flow, "frame_%04d.flo" % i),
                      rng.randn(H, W, 2).astype(np.float32) * 4)
            o = (rng.rand(H, W) > 0.9).astype(np.uint8) * 255
            Image.fromarray(o).save(os.path.join(occ, "frame_%04d.png" % i))


def run_with_loader():
    """End-to-end eval pairs/s THROUGH the real loader (VERDICT r1 #5):
    PNG decode in worker threads overlapping device compute."""
    import jax
    import jax.numpy as jnp
    from irr_tpu import models, losses
    from irr_tpu.data import SintelTrainingCleanFull
    from irr_tpu.data.loader import DataLoader
    from irr_tpu.nn.core import set_compute_dtype

    _enable_compile_cache(jax)

    root = os.environ.get("IRR_BENCH_DATA", "/tmp/irr_bench_sintel")
    _make_sintel_tree(root)
    # decoded-sample cache: the warmup epoch decodes + fills it, the timed
    # epoch measures the steady state (epoch >= 2) of a real training run
    from irr_tpu.data.cache import set_decode_cache
    set_decode_cache(os.environ.get("IRR_BENCH_DECODE_CACHE",
                                    "/tmp/irr_bench_decode_cache"))

    set_compute_dtype(jnp.bfloat16)
    model = models.IRR_PWC()
    loss_mod = losses.MultiScaleEPE_PWC_Bi_Occ_upsample(
        batch_size=BATCH, div_flow=0.05)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))

    dataset = SintelTrainingCleanFull(root=root,
                                      photometric_augmentations=False)

    from irr_tpu.nn.core import normalize_image_batch

    @jax.jit
    def fwd(p, b):
        b = normalize_image_batch(b)
        out = model.apply(p, b, training=False)
        ld = loss_mod(out, b, training=False)
        return ld["epe"]

    KEYS = ("input1", "input2", "target1", "target_occ1")

    def epoch():
        # device-prefetch thread: H2D of batch N+1 overlaps batch N's
        # forward (what a production input pipeline does with PCIe DMA;
        # through the axon tunnel the overlap is partial at best)
        import queue
        import threading
        loader = DataLoader(dataset, batch_size=BATCH, shuffle=False,
                            num_workers=6, drop_last=True, prefetch=3)
        q = queue.Queue(maxsize=2)

        def feeder():
            try:
                for batch in loader:
                    q.put({k: jnp.asarray(batch[k]) for k in KEYS})
            finally:
                # always deliver the sentinel: a decode/transfer error in
                # this thread must not leave the main loop blocked on get()
                q.put(None)

        th = threading.Thread(target=feeder, daemon=True)
        th.start()
        pend = None
        n = 0
        while True:
            b = q.get()
            if b is None:
                break
            e = fwd(params, b)
            if pend is not None:
                float(np.asarray(pend))
            pend = e
            n += BATCH
        float(np.asarray(pend))
        th.join()
        return n

    epoch()  # warmup: jit compile + decode cache + page cache
    t0 = time.perf_counter()
    n = epoch()
    dt = time.perf_counter() - t0
    pairs_per_sec = n / dt

    # quantify the environment's H2D artifact: this dev setup reaches the
    # TPU through a tunnel measured at ~10-130 MB/s (varies by the minute),
    # vs >=10 GB/s host-attached PCIe in production. Measure right now and
    # report the wire cost alongside the end-to-end number.
    probe = np.random.RandomState(0).randint(
        0, 255, (BATCH, H, W, 3), np.uint8)
    a = jnp.asarray(probe); float(a.ravel()[0])
    t0 = time.perf_counter()
    a = jnp.asarray(probe); float(a.ravel()[0])
    h2d_mbps = probe.nbytes / (time.perf_counter() - t0) / 1e6
    bytes_per_pair = sum(
        np.dtype(d).itemsize * H * W * c
        for d, c in (("uint8", 3), ("uint8", 3), ("float32", 2), ("uint8", 1)))
    rec = {
        "metric": "IRR-PWC eval pairs/sec/chip end-to-end through loader "
                  "@ Sintel 1024x436 (bf16)",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_A100_PAIRS_PER_SEC, 3),
        "h2d_tunnel_MBps": round(h2d_mbps, 1),
        "wire_MB_per_pair": round(bytes_per_pair / 1e6, 2),
        "note": "dev-tunnel H2D (~MB/s) bounds this number; on a "
                "production host (>=10 GB/s) end-to-end is "
                "min(host decode, device) - see PERF.md 'The tunnel "
                "H2D wall'",
    }
    print(json.dumps(rec))
    _record_local(rec)


def run_loader_only():
    """Host-side input-pipeline throughput: decode -> pair chain -> batch
    stacking, no device work. Separates the loader's own ceiling from the
    tunnel H2D artifact (see PERF.md 'The tunnel H2D wall')."""
    from irr_tpu.data import SintelTrainingCleanFull
    from irr_tpu.data.loader import DataLoader
    from irr_tpu.data.cache import set_decode_cache

    root = os.environ.get("IRR_BENCH_DATA", "/tmp/irr_bench_sintel")
    _make_sintel_tree(root)
    set_decode_cache(os.environ.get("IRR_BENCH_DECODE_CACHE",
                                    "/tmp/irr_bench_decode_cache"))
    dataset = SintelTrainingCleanFull(root=root,
                                      photometric_augmentations=False)

    def epoch():
        loader = DataLoader(dataset, batch_size=BATCH, shuffle=False,
                            num_workers=6, drop_last=True, prefetch=3)
        n = 0
        for batch in loader:
            n += batch["input1"].shape[0]
        return n

    epoch()  # warmup: fill decode cache + page cache
    t0 = time.perf_counter()
    n = epoch()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "input pipeline pairs/sec host-side (decode+stack, cached)"
                  " @ Sintel 1024x436",
        "value": round(n / dt, 2),
        "unit": "pairs/s",
        "vs_baseline": round(n / dt / BASELINE_A100_PAIRS_PER_SEC, 3),
    }))


def _enable_compile_cache(jax):
    """Same persistent XLA compile cache main.py uses: repeat bench runs
    (driver end-of-round, mode sweeps) skip the 20-40 s cold compile."""
    cache_dir = os.environ.get("IRR_TPU_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/irr_tpu_xla"))
    if cache_dir and cache_dir != "0":
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass


def _parse_modes():
    """Parse the perf-mode flags from sys.argv (shared by the live bench
    and the dead-tunnel fallback so both build the SAME metric string)."""
    # DEFAULT = the production serving configuration: approx_guidance
    # stride 2, the measured zero-EPE / −0.0005-F1 fast mode (RESULTS.md
    # "Final evaluation", PERF.md "Round 5: the approx-density ladder").
    # --exact times the reference-exact parity path instead;
    # --approx-guidance is accepted for compatibility (now the default).
    approx = "--exact" not in sys.argv
    # --approx-guidance-stride N: guidance subsampling stride (default 2;
    # 4 = 16x fewer guidance descriptors — EPE cost measured separately)
    approx_stride = 2
    if "--approx-guidance-stride" in sys.argv:
        approx_stride = int(sys.argv[sys.argv.index("--approx-guidance-stride") + 1])
        if not approx:
            sys.exit("--exact conflicts with --approx-guidance-stride "
                     "(the stride IS an approx-guidance parameter)")
    # --approx-refine: also run the two L1-4 refinement guidance warps
    # (RefineFlow image-warp error, RefineOcc feature-warp error) at the
    # reduced density (--model_approx_refine_guidance); EPE cost measured
    # separately on trained checkpoints (RESULTS.md)
    approx_refine = "--approx-refine" in sys.argv
    if approx_refine and not approx:
        sys.exit("--exact conflicts with --approx-refine (the refine "
                 "reduction runs on top of approx guidance)")
    # --grouped-towers: time the grouped-conv flow+occ towers
    # (--model_grouped_towers); bit-exact in f32, measured EPE cost in
    # bf16 (RESULTS.md "Final evaluation")
    # (scripts/eval_synth_ckpt.sh checks this on trained weights)
    grouped = "--grouped-towers" in sys.argv
    # --conv-impl im2col|shiftsum: dense-tower conv codegen reformulations
    # (nn.core.set_conv_impl) — same multiply-add set as the XLA conv path
    impl = "conv"
    if "--conv-impl" in sys.argv:
        impl = sys.argv[sys.argv.index("--conv-impl") + 1]
    return approx, approx_stride, approx_refine, grouped, impl


def _mode_suffix(approx, approx_stride, approx_refine, grouped, impl):
    return ((" [approx_guidance]" if approx_stride == 2 else
             f" [approx_guidance s={approx_stride}]") if approx else "") \
        + (" [approx_refine]" if approx_refine else "") \
        + (" [grouped_towers]" if grouped else "") \
        + (f" [conv_impl={impl}]" if impl != "conv" else "")


def main():
    import jax
    import jax.numpy as jnp
    from irr_tpu import models
    from irr_tpu.nn.core import set_compute_dtype

    _enable_compile_cache(jax)
    set_compute_dtype(jnp.bfloat16)
    approx, approx_stride, approx_refine, grouped, impl = _parse_modes()
    if impl != "conv":
        from irr_tpu.nn.core import set_conv_impl
        set_conv_impl(impl)
    model = models.IRR_PWC(approx_guidance=approx,
                           approx_guidance_stride=approx_stride,
                           approx_refine_guidance=approx_refine,
                           grouped_towers=grouped)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    batch = {
        "input1": jnp.asarray(rng.rand(BATCH, H, W, 3).astype(np.float32)),
        "input2": jnp.asarray(rng.rand(BATCH, H, W, 3).astype(np.float32)),
    }

    fwd = jax.jit(lambda p, b: model.apply(p, b, training=False))

    def sync(o):
        # force completion with a host read: block_until_ready is not
        # reliable through the axon device tunnel
        return float(o["flow"].ravel()[0])

    for _ in range(WARMUP):
        sync(fwd(params, batch))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fwd(params, batch)
    sync(out)
    dt = time.perf_counter() - t0

    pairs_per_sec = BATCH * ITERS / dt
    rec = {
        "metric": "IRR-PWC eval image pairs/sec/chip @ Sintel 1024x436 (bf16)"
                  + _mode_suffix(approx, approx_stride, approx_refine,
                                 grouped, impl),
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_A100_PAIRS_PER_SEC, 3),
    }
    print(json.dumps(rec))
    _record_local(rec)


def _record_local(rec):
    """Keep the latest LIVE measurement per metric string in
    BENCH_LOCAL.json so the dead-tunnel fallback can cite a matching-mode
    number even when no driver BENCH_r*.json exists for that mode yet
    (e.g. right after a bench default-mode change)."""
    import datetime
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_LOCAL.json")
    try:
        with open(path) as f:
            book = json.load(f)
    except Exception:
        book = {}
    book[rec["metric"]] = dict(
        rec, ts=datetime.datetime.now(datetime.timezone.utc
                                      ).strftime("%Y-%m-%dT%H:%MZ"))
    try:
        with open(path, "w") as f:
            json.dump(book, f, indent=1, sort_keys=True)
    except OSError:
        pass


def _device_reachable(timeout=480):
    """Fast-fail probe: a dead TPU tunnel HANGS at backend init (it does
    not error), which would wedge the whole bench run. Probe in a
    subprocess with a timeout before touching jax in this process.

    480 s: immediately after ANOTHER process releases the tunnel, the
    next client's backend init can exceed 240 s even on a healthy chip
    (measured 2026-08-19: three back-to-back `--grouped-towers` runs
    false-failed the 240 s probe while their neighbors ran fine); the
    probe exists to catch a HANG, not to race a slow re-attach."""
    import subprocess
    code = "import jax, jax.numpy as jnp; print(float((jnp.ones((4,)) * 3)[0]))"
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                           stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


if __name__ == "__main__":
    if "--loader-only" in sys.argv:
        run_loader_only()  # host-only: needs no device
        sys.exit(0)
    _parse_modes()  # flag-conflict errors fire BEFORE the slow device probe
    with_loader = "--with-loader" in sys.argv
    if not _device_reachable():
        metric = ("IRR-PWC eval pairs/sec/chip end-to-end through loader "
                  "@ Sintel 1024x436 (bf16)"
                  if with_loader else
                  "IRR-PWC eval image pairs/sec/chip @ Sintel 1024x436 (bf16)"
                  + _mode_suffix(*_parse_modes()))
        # cite the newest recorded round whose metric string matches the
        # current mode (so an --approx-refine bench never cites an
        # exact-mode number); sort by PARSED round number, not
        # lexicographically (r100 must beat r99 despite 2-digit padding)
        last = ""
        try:
            import glob
            import re

            def _round_no(path):
                m = re.search(r"BENCH_r(\d+)\.json$", path)
                return int(m.group(1)) if m else -1

            for p in sorted(glob.glob(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "BENCH_r*.json")), key=_round_no, reverse=True):
                with open(p) as f:
                    rec = json.load(f)
                rec = rec.get("parsed", rec) or {}
                if rec.get("value") and rec.get("metric", "") == metric:
                    last = "; last recorded number: %s %s %s" % (
                        os.path.basename(p), rec["value"], rec.get("unit", ""))
                    break
            if not last:
                # no driver round record for this mode — cite the latest
                # LIVE same-metric measurement this repo made itself
                with open(os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_LOCAL.json")) as f:
                    loc = json.load(f).get(metric) or {}
                if loc.get("value"):
                    last = ("; last recorded number: BENCH_LOCAL.json "
                            "%s %s (live %s)" % (loc["value"],
                                                 loc.get("unit", ""),
                                                 loc.get("ts", "?")))
        except Exception:
            pass
        print(json.dumps({
            "metric": metric,
            "value": 0.0,
            "unit": "pairs/s",
            "vs_baseline": 0.0,
            "error": "accelerator unreachable at bench time (device probe "
                     "timed out)" + last,
        }))
        sys.exit(0)
    if with_loader:
        run_with_loader()
    else:
        main()
