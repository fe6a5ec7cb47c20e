"""Replay a training-NaN dump (runtime/loop.py _dump_nan_artifact) and
localize where the NaN is born.

The fail-fast dump holds the exact post-augmentation batch that made
training_loss NaN. This tool restores the nearest checkpoint, re-runs the
forward (training=True) with per-level NaN scans, and prints the first
level/tensor where a non-finite value appears — on CPU by default so it
never contends with a training run for the chip.

Usage:
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
    python perf/nan_postmortem.py <experiment_dir>/nan_dump_batch0381.npz \
        [--ckpt <experiment_dir>] [--dtype bfloat16|float32] [--grad]

--grad additionally runs value_and_grad of the total loss and NaN-scans
the gradient tree (a forward-clean batch can still blow up in a custom
VJP; see ops/warp.py quad-packed scatter).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _scan(tag, tree):
    import jax
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf, np.float32)
        n_nan, n_inf = int(np.isnan(a).sum()), int(np.isinf(a).sum())
        if n_nan or n_inf:
            bad.append((jax.tree_util.keystr(path), a.shape, n_nan, n_inf))
    status = "CLEAN" if not bad else "NON-FINITE"
    print("%-28s %s" % (tag, status))
    for keystr, shape, n_nan, n_inf in bad:
        print("    %s shape=%s nan=%d inf=%d" % (keystr, shape, n_nan, n_inf))
    return bool(bad)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dump")
    ap.add_argument("--ckpt", default=None,
                    help="experiment dir (default: the dump's directory)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--grad", action="store_true")
    ap.add_argument("--div_flow", type=float, default=0.05)
    ap.add_argument("--params", default=None,
                    help="nan_dump_params_*.npz from --nan_dump_params: "
                         "replay against the captured in-flight params "
                         "instead of the nearest checkpoint")
    ap.add_argument("--model", default="IRR_PWC",
                    help="registry name of the model that made the dump")
    ap.add_argument("--loss", default="MultiScaleEPE_PWC_Bi_Occ_upsample",
                    help="registry name of the training loss (--grad)")
    ap.add_argument("--num_iters", type=int, default=None,
                    help="iteration count for *_irr models")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from irr_tpu import models, losses
    from irr_tpu.nn.core import set_compute_dtype, normalize_image_batch
    from irr_tpu.runtime.checkpoint import CheckpointSaver

    set_compute_dtype(jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)

    data = np.load(args.dump)
    batch = {k: jnp.asarray(v) for k, v in data.items()
             if not k.startswith("loss__")}
    print("dump:", args.dump)
    for k in data.files:
        if k.startswith("loss__"):
            print("  recorded %s = %s" % (k[6:], float(data[k])))
    _scan("dumped batch", batch)

    ckpt_dir = args.ckpt or os.path.dirname(os.path.abspath(args.dump))
    model_kwargs = {"div_flow": args.div_flow}
    if args.num_iters is not None:
        model_kwargs["num_iters"] = args.num_iters
    model = getattr(models, args.model)(**model_kwargs)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    saver = CheckpointSaver()
    ckpt_file = args.params or saver.resolve(ckpt_dir)
    params = saver.restore(ckpt_file, params)
    print("checkpoint:", ckpt_file)
    _scan("params", params)

    batch = normalize_image_batch(batch)
    out = jax.jit(lambda p, b: model.apply(p, b, training=True))(params, batch)
    # training=True returns a dict of per-level (or per-iteration) tensor
    # lists whose key names vary by family (IRR_PWC: flow/occ; FlowNet:
    # flow2..flow6/occ2..occ6); scan every key's entries in order
    first_bad = None
    for key in out:
        entries = out[key] if isinstance(out[key], (list, tuple)) else [out[key]]
        for l, t in enumerate(entries):
            n = len(t) if isinstance(t, (list, tuple)) else 1
            bad = _scan("%s[%d] (%d tensors)" % (key, l, n), t)
            if first_bad is None and bad:
                first_bad = "%s[%d]" % (key, l)
    if first_bad is not None:
        print("\n==> first non-finite output: %s "
              "(inputs and params scanned above)" % first_bad)
    else:
        print("\n==> forward is CLEAN at this checkpoint"
              " (the NaN needed the exact in-flight params, or the grad;"
              " try --grad)")

    if args.grad:
        loss_mod = getattr(losses, args.loss)(
            batch_size=batch["input1"].shape[0], div_flow=args.div_flow)

        def loss_of(p):
            o = model.apply(p, batch, training=True)
            return loss_mod(o, batch, training=True)["total_loss"]

        val, grads = jax.jit(jax.value_and_grad(loss_of))(params, )
        print("total_loss = %s" % float(val))
        _scan("grads", grads)


if __name__ == "__main__":
    main()
