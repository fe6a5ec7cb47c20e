"""Repro for the epoch-1 F1_avg=nan seen on the last validation batches
of the synth accuracy run (logbook 2026-08-19 02:54:34): run the exact
val path (bf16 production mode) over the TAIL of the frozen valid split,
print per-batch epe/F1 and nan-scan the model outputs.

Usage: JAX_PLATFORMS=cpu python perf/repro_f1_nan.py <experiment_dir> [root]
       python perf/repro_f1_nan.py --pad <experiment_dir>   # on TPU

Status (round 4): root-caused to an axon/XLA:TPU miscompile of the B=3
odd-batch executable — this script run WITHOUT --pad on the TPU shows the
all-NaN occ on the tail batch; the same run on CPU (env
PYTHONPATH=/root/repo JAX_PLATFORMS=cpu) is clean. With --pad it applies
the production fix (make_eval_step-style in-graph padding to B=4 +
output slicing) and must be clean on TPU too.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from irr_tpu import models, losses
    from irr_tpu.data import FlyingChairsOccValid
    from irr_tpu.data.loader import DataLoader
    from irr_tpu.nn.core import set_compute_dtype, normalize_image_batch
    from irr_tpu.runtime.checkpoint import CheckpointSaver

    argv = [a for a in sys.argv[1:] if a != "--pad"]
    use_pad = "--pad" in sys.argv[1:]
    exp = argv[0]
    root = argv[1] if len(argv) > 1 else "/tmp/chairs_occ_1850"

    set_compute_dtype(jnp.bfloat16)
    model = models.IRR_PWC(div_flow=0.05)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    saver = CheckpointSaver()
    params = saver.restore(saver.resolve(exp), params)
    loss_mod = losses.MultiScaleEPE_PWC_Bi_Occ_upsample(batch_size=4,
                                                        div_flow=0.05)

    ds = FlyingChairsOccValid(root=root, photometric_augmentations=False)
    loader = DataLoader(ds, batch_size=4, shuffle=False, drop_last=False,
                        num_workers=1)
    n_batches = len(loader)

    if use_pad:
        from irr_tpu.parallel.train import make_eval_step
        print("mode: padded eval (make_eval_step pad_to=4 — the fix)")
        val_step = make_eval_step(model, loss_mod, pad_to=4)
    else:
        @jax.jit
        def val_step(p, batch):
            batch = normalize_image_batch(batch)
            out = model.apply(p, batch, training=False)
            ld = loss_mod(out, batch, training=False)
            return ld, out

    for bi, batch in enumerate(loader):
        if bi < n_batches - 2:
            continue
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if not isinstance(v, (str, list, tuple))}
        ld, out = val_step(params, batch)
        occ = np.asarray(out["occ"], dtype=np.float32)
        flow = np.asarray(out["flow"], dtype=np.float32)
        print("batch %d  B=%d  epe=%s  F1=%s  occ[nan=%d inf=%d "
              "min=%.3g max=%.3g]  flow[nan=%d]"
              % (bi, batch["input1"].shape[0],
                 float(ld["epe"]), float(ld["F1"]),
                 int(np.isnan(occ).sum()), int(np.isinf(occ).sum()),
                 occ.min(), occ.max(), int(np.isnan(flow).sum())),
              flush=True)


if __name__ == "__main__":
    main()
