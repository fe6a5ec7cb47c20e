"""Benchmark: IRR-PWC image pairs/sec/chip at Sintel resolution (1024x436).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The north star (BASELINE.json) is >=5x the reference PyTorch IRR-PWC on an
A100. No A100 is reachable from this environment and the reference repo
publishes no throughput numbers, so the baseline constant below is an
ESTIMATE of the reference's A100 eval throughput at this resolution:
IRR-PWC reports ~0.18 s/frame on a 1080Ti-era GPU; an A100 is ~4-6x that
GPU on conv workloads, giving ~20 pairs/sec. vs_baseline = value / 20.0.

Runs eval-mode forward (the metric's setting) with bf16 conv compute
(f32 accumulation), batched to fill the chip, on the one real TPU.
"""

import json
import time

import numpy as np

BASELINE_A100_PAIRS_PER_SEC = 20.0  # estimated reference throughput (see above)
H, W = 436, 1024
BATCH = 8
WARMUP = 3
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp
    from irr_tpu import models
    from irr_tpu.nn.core import set_compute_dtype

    set_compute_dtype(jnp.bfloat16)
    model = models.IRR_PWC()
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
    print(json.dumps({
        "metric": "IRR-PWC eval image pairs/sec/chip @ Sintel 1024x436 (bf16)",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_A100_PAIRS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
