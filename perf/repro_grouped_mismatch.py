"""Isolate the grouped-towers eval mismatch (round 4).

scripts/eval_synth_ckpt.sh measured the trained stage-1 checkpoint at
val EPE 1.5187 (exact) vs 2.2882 (--model_grouped_towers) on the TPU in
bf16 — but the grouped formulation is exact-by-construction and its
CPU/f32/random-init tests pass. This script pins down which axis breaks
it by comparing exact vs grouped flow outputs ON THE SAME trained
checkpoint and the same fixed validation batch, per platform/dtype:

    python perf/repro_grouped_mismatch.py cpu f32
    python perf/repro_grouped_mismatch.py cpu bf16
    python perf/repro_grouped_mismatch.py tpu bf16   (default platform)

If CPU agrees in both dtypes and TPU diverges, it's another axon/XLA:TPU
executable miscompile (cf. the odd-batch all-NaN one, RESULTS.md); if
bf16 diverges everywhere, it's numeric; if all diverge, a layout bug the
random-init test misses.
"""

import sys

if len(sys.argv) >= 2 and sys.argv[1] == "cpu":
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from irr_tpu.models import IRR_PWC
from irr_tpu.nn.core import set_compute_dtype, normalize_image_batch
from irr_tpu.runtime.checkpoint import CheckpointSaver
from irr_tpu.data.datasets import FlyingChairsOccValid


def main():
    dtype = sys.argv[2] if len(sys.argv) >= 3 else "bf16"
    set_compute_dtype(jnp.bfloat16 if dtype == "bf16" else jnp.float32)
    print("backend:", jax.default_backend(), "compute dtype:", dtype)

    ds = FlyingChairsOccValid(root="/tmp/chairs_occ_1850")
    ex = [ds[i] for i in range(4)]
    batch = {
        k: jnp.asarray(np.stack([np.asarray(e[k]) for e in ex]))
        for k in ("input1", "input2", "target1", "target_occ1")
    }

    m_exact = IRR_PWC()
    m_group = IRR_PWC(grouped_towers=True)
    params = jax.jit(m_exact.init)(jax.random.PRNGKey(0))
    saver = CheckpointSaver()
    ckpt = saver.resolve("experiments/irr_pwc_synth_stage1_r3",
                         mode="resume_from_best")
    params = saver.restore(ckpt, params)

    def epe(flow):
        gt = np.asarray(batch["target1"], np.float32)
        d = np.asarray(flow, np.float32) - gt
        return float(np.sqrt((d ** 2).sum(-1)).mean())

    out0 = jax.jit(lambda p, b: m_exact.apply(
        p, normalize_image_batch(b), training=False))(params, batch)
    out1 = jax.jit(lambda p, b: m_group.apply(
        p, normalize_image_batch(b), training=False))(params, batch)
    f0 = np.asarray(out0["flow"], np.float32)
    f1 = np.asarray(out1["flow"], np.float32)
    d = np.abs(f0 - f1)
    print(f"exact EPE   {epe(f0):.4f}")
    print(f"grouped EPE {epe(f1):.4f}")
    print(f"flow |delta|: max {d.max():.4f} mean {d.mean():.6f}")
    nan0 = int(np.isnan(f0).sum())
    nan1 = int(np.isnan(f1).sum())
    if nan0 or nan1:
        print(f"NaNs: exact {nan0} grouped {nan1}")


if __name__ == "__main__":
    main()
