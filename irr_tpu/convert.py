"""Convert reference (PyTorch) checkpoints to irr_tpu param trees.

The reference stores `model_and_loss.state_dict()` (configuration.py:281-314)
with keys like `_model.feature_pyramid_extractor.convs.0.0.0.weight` —
module attribute paths where every `conv()` helper wraps Conv2d in a
Sequential (pwc_modules.py:8-19, hence the trailing `.0`).

Key mapping (torch -> irr_tpu param path):
    _model.                             stripped
    feature_pyramid_extractor.convs.L.K.0.weight
        -> feature_pyramid_extractor/L/K/w
    flow_estimators.convN.0.weight      -> flow_estimators/convN/w
    context_networks.convs.I.0.weight   -> context_networks/I/w
    occ_shuffle_upsample.res_convs.I.0. -> occ_shuffle_upsample/res_convs/I/
    refine_flow.convs.I.0.              -> refine_flow/I/
    conv_1x1.I.0.                       -> conv_1x1/I/
    ...
Weight layout: torch Conv2d (Cout, Cin, KH, KW) -> HWIO (KH, KW, Cin, Cout);
ConvTranspose2d (Cin, Cout, KH, KW) -> spatially flipped HWIO of the
equivalent input-dilated conv (see nn/core.ConvTranspose).

Usage:
    python -m irr_tpu.convert torch_ckpt.pkl out.ckpt --model IRR_PWC
(.pkl / .pth loaded with torch if available, else numpy pickle)
"""

import argparse
import logging
import re

import numpy as np


def torch_conv_to_hwio(w):
    """(Cout, Cin, KH, KW) -> (KH, KW, Cin, Cout)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def torch_deconv_to_hwio(w):
    """ConvTranspose2d (Cin, Cout, KH, KW) -> flipped HWIO for the
    equivalent lhs-dilated conv."""
    w = np.transpose(np.asarray(w), (2, 3, 0, 1))  # (KH, KW, Cin, Cout)
    return w[::-1, ::-1]


_RULES = [
    # (regex on the torch key minus weight/bias suffix, replacement)
    (re.compile(r"^feature_pyramid_extractor\.convs\.(\d+)\.(\d+)\.0$"),
     r"feature_pyramid_extractor/\1/\2"),
    (re.compile(r"^(flow_estimators|occ_estimators)\.(conv\d|conv_last)\.0$"),
     r"\1/\2"),
    # per-level ModuleList estimators (pwcnet.py:23-40 PWCNet/_bi/_occ/_occ_bi)
    (re.compile(r"^(flow_estimators|occ_estimators)\.(\d+)\.(conv\d|conv_last)\.0$"),
     r"\1/\2/\3"),
    (re.compile(r"^(context_networks|occ_context_networks)\.convs\.(\d+)\.0$"),
     r"\1/\2"),
    (re.compile(r"^occ_shuffle_upsample\.(init_conv|res_end_conv|out_convs)\.0$"),
     r"occ_shuffle_upsample/\1"),
    (re.compile(r"^occ_shuffle_upsample\.res_convs\.(\d+)\.0$"),
     r"occ_shuffle_upsample/res_convs/\1"),
    (re.compile(r"^(refine_flow|refine_occ)\.convs\.(\d+)\.0$"), r"\1/\2"),
    (re.compile(r"^conv_1x1\.(\d+)\.0$"), r"conv_1x1/\1"),
    (re.compile(r"^conv_1x1_1\.0$"), r"conv_1x1_1"),
    # FlowNet family (flownet1s.py / IRR_FlowNet.py attribute names)
    (re.compile(r"^_flownets\._(conv\d(?:_1)?|predict_flow\d|predict_occ\d|"
                r"upsample_flow\d_to_\d|upsample_occ\d_to_\d|deconv\d|"
                r"deconv_occ\d)(?:\.0)?$"),
     r"flownets/\1"),
    (re.compile(r"^_(conv\d)(?:\.0)?$"), r"stem/\1"),
    (re.compile(r"^(occ_shuffle_upsample|refine_flow|refine_occ)$"), r"\1"),
]

_DECONV_PAT = re.compile(r"(deconv|upsample_flow|upsample_occ)")


def map_torch_key(key):
    """Return (our_path_without_leaf, transform) or None if unmapped."""
    for pat, repl in _RULES:
        m = pat.match(key)
        if m:
            path = pat.sub(repl, key)
            transform = (torch_deconv_to_hwio if _DECONV_PAT.search(key)
                         else torch_conv_to_hwio)
            return path, transform
    return None


def convert_state_dict(state_dict):
    """torch-style {key: ndarray} -> {our_path: ndarray} (flat)."""
    out = {}
    unmapped = []
    for full_key, value in state_dict.items():
        key = full_key
        for prefix in ("_model.", "module.", "model."):
            if key.startswith(prefix):
                key = key[len(prefix):]
        if key.startswith(("_training_loss", "_validation_loss")):
            continue
        if key.endswith(".weight"):
            base, leaf = key[:-len(".weight")], "w"
        elif key.endswith(".bias"):
            base, leaf = key[:-len(".bias")], "b"
        else:
            unmapped.append(full_key)
            continue
        mapped = map_torch_key(base)
        if mapped is None:
            unmapped.append(full_key)
            continue
        path, transform = mapped
        arr = np.asarray(value)
        out[f"{path}/{leaf}"] = transform(arr) if leaf == "w" and arr.ndim == 4 else arr
    if unmapped:
        logging.warning("convert: %d unmapped keys, e.g. %s",
                        len(unmapped), unmapped[:5])
    return out


def load_into_params(state_dict, params):
    """Convert and place into a params tree (returns new tree + stats)."""
    import jax
    from .nn.core import param_paths
    flat = convert_state_dict(state_dict)
    ours = param_paths(params)
    placed, missing, shape_mismatch = 0, [], []
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    new_leaves = []
    from .runtime.checkpoint import _path_str
    for path, leaf in leaves:
        key = _path_str(path)
        if key in flat:
            val = flat[key]
            if tuple(val.shape) != tuple(leaf.shape):
                shape_mismatch.append((key, val.shape, tuple(leaf.shape)))
                new_leaves.append(leaf)
            else:
                new_leaves.append(val.astype(np.float32))
                placed += 1
        else:
            missing.append(key)
            new_leaves.append(leaf)
    return (jax.tree_util.tree_unflatten(treedef, new_leaves),
            {"placed": placed, "missing": missing,
             "shape_mismatch": shape_mismatch,
             "unused": sorted(set(flat) - set(ours))})


def main(argv=None):
    """CLI: `python -m irr_tpu.convert <ref.ckpt> <out.ckpt> --model IRR_PWC`.

    <ref.ckpt> is a reference checkpoint — torch.save of
    {**stats, "state_dict": model_and_loss.state_dict()}
    (configuration.py:281-300) or a bare state_dict — loaded with torch
    when available, numpy pickle otherwise. <out.ckpt> is written in
    irr_tpu's npz checkpoint format at EXACTLY that path; point
    `main.py --checkpoint=<out.ckpt>` at it directly (resolve() passes
    concrete files through).
    """
    from . import models as model_zoo
    from .runtime import checkpoint as ckpt_mod
    import jax

    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--model", default="IRR_PWC")
    args = p.parse_args(argv)

    try:
        import torch
        sd = torch.load(args.src, map_location="cpu", weights_only=False)
    except ImportError:
        import pickle
        with open(args.src, "rb") as f:
            sd = pickle.load(f)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items()}

    model = getattr(model_zoo, args.model)()
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    new_params, stats = load_into_params(sd, params)
    print(f"placed {stats['placed']} tensors; "
          f"missing {len(stats['missing'])}; "
          f"unused {len(stats['unused'])}; "
          f"shape mismatches {len(stats['shape_mismatch'])}")
    for key, got, want in stats["shape_mismatch"][:10]:
        print(f"  shape mismatch {key}: ckpt {got} vs model {want}")
    if stats["placed"] == 0:
        raise SystemExit(f"no tensors mapped onto {args.model} — wrong "
                         f"--model or not a reference checkpoint?")
    flat = ckpt_mod._flatten(new_params)
    with open(args.dst, "wb") as f:  # file handle: savez must not append .npz
        np.savez(f, **flat)
    print(f"wrote {args.dst} "
          f"({stats['placed']}/{len(flat)} tensors from {args.src})")


if __name__ == "__main__":
    main()
