"""Train-step timings for ALL curriculum stages (VERDICT r2 #5).

The stage-1 number (B=4 384x512 ChairsOcc loss, PERF.md history) is the
only one that was ever measured; the other recipes change shape AND loss:

  stage 2/3-Sintel: crop 384x768, MultiScaleEPE_PWC_Bi_Occ_upsample(_Sintel)
    (reference scripts/IRR-PWC_things3d.sh:21-47, IRR-PWC_sintel_train.sh)
  stage 3-KITTI:    crop 320x896, MultiScaleEPE_PWC_Bi_Occ_upsample_KITTI
    (sparse valid-masked reductions, different backward hot ops;
     reference scripts/IRR-PWC_kitti_train.sh:20-48)

Times one full jitted step (grad + Adam) per stage with the host-read
sync discipline (see perf/README.md).

Usage: python perf/stage_shapes.py [substr ...]
  Optional argv substrings filter which stages run (e.g. "KITTI") —
  compiles cost ~5 min each through a degraded tunnel, so stages are
  often measured one at a time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf).ravel()[0])


def main():
    from irr_tpu import models, losses, optim
    from irr_tpu.nn.core import set_compute_dtype
    from irr_tpu.parallel.train import make_train_step, TrainState

    set_compute_dtype(jnp.bfloat16)
    model = models.IRR_PWC()
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    optimizer = optim.Adam(lr=1e-4)

    stages = [
        ("stage1 ChairsOcc  B4 384x512",
         384, 512, losses.MultiScaleEPE_PWC_Bi_Occ_upsample, False),
        ("stage2 Things3D   B4 384x768",
         384, 768, losses.MultiScaleEPE_PWC_Bi_Occ_upsample, False),
        ("stage3 Sintel     B4 384x768",
         384, 768, losses.MultiScaleEPE_PWC_Bi_Occ_upsample_Sintel, False),
        ("stage3 KITTI      B4 320x896",
         320, 896, losses.MultiScaleEPE_PWC_Bi_Occ_upsample_KITTI, True),
    ]

    filters = [a for a in sys.argv[1:] if not a.startswith("-")]
    if filters:
        stages = [s for s in stages
                  if any(f.lower() in s[0].lower() for f in filters)]

    B = 4
    for name, H, W, loss_cls, sparse in stages:
        loss_mod = loss_cls(batch_size=B, div_flow=0.05)
        rng = np.random.RandomState(0)
        batch = {
            "input1": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
            "input2": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
            "target1": jnp.asarray(rng.randn(B, H, W, 2).astype(np.float32)),
            "target2": jnp.asarray(rng.randn(B, H, W, 2).astype(np.float32)),
            "target_occ1": jnp.asarray((rng.rand(B, H, W, 1) > 0.8).astype(np.float32)),
            "target_occ2": jnp.asarray((rng.rand(B, H, W, 1) > 0.8).astype(np.float32)),
        }
        if sparse:
            batch["input_valid"] = jnp.asarray(
                (rng.rand(B, H, W, 1) > 0.5).astype(np.float32))
        opt_state = optimizer.init(params)
        step = make_train_step(model, loss_mod, optimizer, donate=False)
        state = TrainState(params, opt_state)
        t0 = time.perf_counter()
        out = step(state, batch)
        _sync(out[1])
        compile_s = time.perf_counter() - t0
        _sync(step(state, batch)[1])
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(state, batch)
        _sync(out[1])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt * 1e3:7.1f} ms/step "
              f"({B / dt:5.2f} pairs/s; compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
