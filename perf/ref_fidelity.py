"""Trained-weights whole-model fidelity gate (VERDICT r4 missing #1).

Trains the ACTUAL reference torch IRR_PWC (/root/reference/models/
IRR_PWC.py:51-184) on CPU on in-memory synth scenes with the reference's
own training loss (losses.py:515-571 MultiScaleEPE_PWC_Bi_Occ_upsample),
converts the real trained ``state_dict()`` through ``irr_tpu.convert``,
and compares UNPATCHED eval outputs statistically on held-out scenes.

Why this exists: the random-init gate (tests/test_fidelity.py) must patch
the chaotic warp mask on both sides because random-weight flows amplify
sub-ulp backend differences through 5 cascaded warp levels. A TRAINED
checkpoint produces smooth, small flows, so the cascade damps and the two
implementations can be compared as-is — per-pixel EPE between backends,
tail quantiles, and metric parity (EPE / occ-F1 vs ground truth computed
independently on each side). This is the closest this environment can get
to the reference's pretrained-LFS-checkpoint parity check (§7.9), and it
is ``irr_tpu.convert``'s first exercise on a REAL trained torch
checkpoint rather than a synthesized key set.

Torch-side shim (training AND eval): the reference's ``rescale_flow``
(pwc_modules.py:70-82) does ``u *= scale`` on views of ``chunk()``, which
modern torch autograd rejects outright; ``_import_reference`` patches in
a whole-tensor in-place ``mul_`` replica — same math, same in-place
mutation side effect (which IS load-bearing: see the function's
docstring), autograd-legal. The torch eval forward therefore also runs
through this replica; "unpatched" in this module's comparisons refers to
the warp MASK (no analytic-mask substitution), not to rescale_flow.

Usage:
    python perf/ref_fidelity.py --steps 150 --out /tmp/ref_fid
Prints one JSON line with the comparison statistics; the gated test
(tests/test_trained_fidelity.py) asserts thresholds on the same dict.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

H, W = 128, 192
DIV_FLOW = 0.05


def _import_reference():
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import models as ref_models  # noqa: F401  (package import)

    def rescale_flow_inplace(flow, div_flow, width_im, height_im,
                             to_local=True):
        """Autograd-legal replica of the reference rescale_flow
        (pwc_modules.py:70-82) INCLUDING its in-place mutation semantics.

        The original does ``u *= scale`` on ``chunk()`` views, which (a)
        modern torch autograd rejects outright, and (b) mutates the
        CALLER's tensor as a side effect. That side effect is load-bearing:
        at IRR_PWC.py:128-129 the rescale nested inside the warp call
        converts flow_cont to global units before RefineFlow reads it at
        :132, and :135 then rescales it a second time. Our jax model
        replicates that quirk (models/irr_pwc.py), so the torch side of
        this harness must keep it too — a side-effect-free patch trains
        and evaluates a DIFFERENT model (measured: 3.34 px cross-impl EPE
        that vanishes with the faithful patch). An in-place broadcast
        ``mul_`` on the whole tensor (no chunk views) keeps the mutation,
        is autograd-legal, and is gradient-correct: every rescaled tensor
        here is a non-view op output whose producer's backward does not
        need its pre-scale value."""
        if to_local:
            u_scale = float(flow.size(3) / width_im / div_flow)
            v_scale = float(flow.size(2) / height_im / div_flow)
        else:
            u_scale = float(width_im * div_flow / flow.size(3))
            v_scale = float(height_im * div_flow / flow.size(2))
        scale = torch.tensor([u_scale, v_scale],
                             dtype=flow.dtype).view(1, 2, 1, 1)
        return flow.mul_(scale)

    # IRR_PWC.py:6 does `from .pwc_modules import rescale_flow`, so the
    # name lives in several module namespaces; patch them all. NOTE:
    # `models.IRR_PWC` the *attribute* is rebound to the class by the
    # package __init__, so go through sys.modules, not attribute access.
    for name, mod in list(sys.modules.items()):
        if name.startswith("models") and hasattr(mod, "rescale_flow"):
            mod.rescale_flow = rescale_flow_inplace
    return ref_models


def _make_scenes(n, seed):
    """In-memory synth scenes as torch-ready NCHW float32 arrays."""
    from irr_tpu.data.synth import make_scene

    ims1, ims2, flos, occs, flos_b, occs_b = [], [], [], [], [], []
    for i in range(n):
        rng = np.random.RandomState(seed * 1000003 + i)
        s = make_scene(rng, H, W)
        ims1.append(s["img1"].astype(np.float32) / 255.0)
        ims2.append(s["img2"].astype(np.float32) / 255.0)
        flos.append(s["flow_f"])
        flos_b.append(s["flow_b"])
        occs.append((s["occ1"] > 127).astype(np.float32)[..., None])
        occs_b.append((s["occ2"] > 127).astype(np.float32)[..., None])
    to_nchw = lambda a: np.transpose(np.stack(a), (0, 3, 1, 2))
    return {
        "input1": to_nchw(ims1), "input2": to_nchw(ims2),
        "target1": to_nchw(flos), "target2": to_nchw(flos_b),
        "target_occ1": to_nchw(occs), "target_occ2": to_nchw(occs_b),
    }


def train_reference(steps, batch_size=4, n_scenes=24, seed=3, lr=2e-4,
                    log_every=10, init_sd=None):
    """Train the torch reference IRR_PWC; returns (state_dict, loss_curve).

    init_sd: optional state_dict (numpy arrays) to resume from — lets a
    long run be built up across sessions on this 1-core host."""
    import torch

    ref_models = _import_reference()
    import losses as ref_losses  # /root/reference/losses.py

    class _Args:
        num_iters = 1
        model_div_flow = DIV_FLOW

    args = _Args()
    args.batch_size = batch_size

    torch.manual_seed(11)
    model = ref_models.IRR_PWC(args)
    if init_sd is not None:
        model.load_state_dict({k: torch.from_numpy(np.asarray(v))
                               for k, v in init_sd.items()})
    model.train()
    crit = ref_losses.MultiScaleEPE_PWC_Bi_Occ_upsample(args)
    crit.train()
    opt = torch.optim.Adam(model.parameters(), lr=lr)

    data = _make_scenes(n_scenes, seed)
    tensors = {k: torch.from_numpy(v) for k, v in data.items()}
    rng = np.random.RandomState(99)
    curve = []
    for step in range(steps):
        idx = rng.choice(n_scenes, size=batch_size, replace=False)
        batch = {k: v[idx] for k, v in tensors.items()}
        out = model({"input1": batch["input1"], "input2": batch["input2"]})
        loss_dict = crit(out, batch)
        loss = loss_dict["total_loss"]
        opt.zero_grad()
        loss.backward()
        opt.step()
        curve.append(float(loss_dict["flow_loss"].detach()))
        if step % log_every == 0 or step == steps - 1:
            print("step %4d  total %.4f  flow %.4f  occ %.4f" % (
                step, float(loss), float(loss_dict["flow_loss"]),
                float(loss_dict["occ_loss"])), flush=True)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return sd, curve


def _patch_torch_analytic_mask(model):
    """Swap the reference WarpingLayer's chaotic warped-ones mask for the
    analytic interior test (same everything else) — the same both-sides
    patch tests/test_fidelity.py uses, applied here at a TRAINED
    checkpoint to separate mask-bit chaos from all other arithmetic."""
    import torch
    import torch.nn.functional as tnf
    from models.pwc_modules import get_grid, WarpingLayer

    def forward(self, x, flow, height_im, width_im, div_flow):
        flo_w = flow[:, 0] * 2 / max(width_im - 1, 1) / div_flow
        flo_h = flow[:, 1] * 2 / max(height_im - 1, 1) / div_flow
        flow_for_grid = torch.stack([flo_w, flo_h]).transpose(0, 1)
        grid = torch.add(get_grid(x), flow_for_grid).transpose(1, 2).transpose(2, 3)
        x_warp = tnf.grid_sample(x, grid, align_corners=True)
        h, w = x.shape[2], x.shape[3]
        ix = ((grid[..., 0] + 1) / 2) * (w - 1)
        iy = ((grid[..., 1] + 1) / 2) * (h - 1)
        mask = ((ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1))
        return x_warp * mask.unsqueeze(1).float()

    for mod in model.modules():
        if isinstance(mod, WarpingLayer):
            mod.forward = forward.__get__(mod, WarpingLayer)


def compare(sd, n_val=8, val_seed=77, mask_mode="reference"):
    """Eval-output comparison, torch reference vs ours, on held-out
    scenes; returns the statistics dict.

    mask_mode="reference": fully UNPATCHED comparison (the headline gate).
    mask_mode="analytic": chaotic warp mask replaced by the analytic
    interior mask ON BOTH SIDES — the diagnostic that isolates mask-bit
    chaos from every other op at this trained checkpoint."""
    import torch

    ref_models = _import_reference()
    import jax
    import jax.numpy as jnp

    from irr_tpu import models as our_models
    from irr_tpu.convert import load_into_params
    from irr_tpu.ops import warp as warp_mod

    class _Args:
        num_iters = 1

    model_t = ref_models.IRR_PWC(_Args())
    model_t.load_state_dict({k: torch.from_numpy(np.asarray(v))
                             for k, v in sd.items()})
    model_t.eval()
    if mask_mode == "analytic":
        _patch_torch_analytic_mask(model_t)
        warp_mod.set_warp_mask_mode("analytic")

    data = _make_scenes(n_val, val_seed)
    try:
        with torch.no_grad():
            out_t = model_t({"input1": torch.from_numpy(data["input1"]),
                             "input2": torch.from_numpy(data["input2"])})
        flow_t = np.transpose(out_t["flow"].numpy(), (0, 2, 3, 1))
        occ_t = np.transpose(out_t["occ"].numpy(), (0, 2, 3, 1))

        model_j = our_models.IRR_PWC(div_flow=DIV_FLOW)
        params = jax.jit(model_j.init)(jax.random.PRNGKey(0))
        params, stats = load_into_params(sd, params)
        assert not stats["missing"], stats["missing"][:8]
        assert not stats["shape_mismatch"], stats["shape_mismatch"][:4]
        assert not stats["unused"], stats["unused"][:8]
        fwd = jax.jit(lambda p, d: model_j.apply(p, d, training=False))
        x1 = np.transpose(data["input1"], (0, 2, 3, 1))
        x2 = np.transpose(data["input2"], (0, 2, 3, 1))
        out_j = fwd(params, {"input1": jnp.asarray(x1),
                             "input2": jnp.asarray(x2)})
        flow_j = np.asarray(out_j["flow"], np.float32)
        occ_j = np.asarray(out_j["occ"], np.float32)
    finally:
        warp_mod.set_warp_mask_mode("reference")

    gt_flow = np.transpose(data["target1"], (0, 2, 3, 1))
    gt_occ = np.transpose(data["target_occ1"], (0, 2, 3, 1))[..., 0]

    # cross-implementation flow discrepancy (px)
    d = np.sqrt(((flow_t - flow_j) ** 2).sum(-1))
    # metric parity: EPE / occ-F1 vs ground truth, each side independently
    def _epe(f):
        return float(np.sqrt(((f - gt_flow) ** 2).sum(-1)).mean())

    def _f1(o):
        pred = (1.0 / (1.0 + np.exp(-o[..., 0]))) > 0.5
        tp = float((pred & (gt_occ > 0.5)).sum())
        prec = tp / max(pred.sum(), 1)
        rec = tp / max((gt_occ > 0.5).sum(), 1)
        return 2 * prec * rec / max(prec + rec, 1e-12)

    sig_t = 1.0 / (1.0 + np.exp(-occ_t[..., 0]))
    sig_j = 1.0 / (1.0 + np.exp(-occ_j[..., 0]))
    return {
        "xim_epe_mean": float(d.mean()),
        "xim_epe_p99": float(np.percentile(d, 99)),
        "xim_epe_max": float(d.max()),
        "xim_pct_gt_0p1px": float((d > 0.1).mean() * 100),
        "xim_pct_gt_0p5px": float((d > 0.5).mean() * 100),
        "occ_prob_mad": float(np.abs(sig_t - sig_j).mean()),
        "occ_label_disagree_pct": float(((sig_t > 0.5) != (sig_j > 0.5)).mean() * 100),
        "epe_torch": _epe(flow_t), "epe_ours": _epe(flow_j),
        "f1_torch": _f1(occ_t), "f1_ours": _f1(occ_j),
        "n_val": n_val, "mask_mode": mask_mode,
    }


def sensitivity_probe(sd, n_val=8, val_seed=77, eps=1e-6):
    """Intrinsic chaos of the REFERENCE model at this checkpoint: run the
    torch model twice, input perturbed by +eps, and measure the flow
    divergence. The cascaded warps amplify ulp-scale differences (and
    div_flow multiplies the output by 20), so this — not backend
    arithmetic — sets the floor any cross-implementation comparison can
    reach. Cross-impl discrepancy is judged AGAINST this floor."""
    import torch

    ref_models = _import_reference()

    class _Args:
        num_iters = 1

    model = ref_models.IRR_PWC(_Args())
    model.load_state_dict({k: torch.from_numpy(np.asarray(v))
                           for k, v in sd.items()})
    model.eval()
    data = _make_scenes(n_val, val_seed)
    with torch.no_grad():
        o1 = model({"input1": torch.from_numpy(data["input1"]),
                    "input2": torch.from_numpy(data["input2"])})
        o2 = model({"input1": torch.from_numpy(data["input1"] + eps),
                    "input2": torch.from_numpy(data["input2"])})
    d = np.sqrt(((o1["flow"].numpy() - o2["flow"].numpy()) ** 2
                 ).sum(1))
    return {"sens_epe_mean": float(d.mean()),
            "sens_epe_p99": float(np.percentile(d, 99)),
            "sens_eps": eps}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--n_scenes", type=int, default=24)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--threads", type=int, default=0,
                   help="torch CPU threads (0 = torch default)")
    p.add_argument("--out", default="",
                   help="save the trained state_dict (npz) here")
    p.add_argument("--resume", default="",
                   help="npz state_dict to continue training from")
    p.add_argument("--compare-only", action="store_true",
                   help="skip training; just compare --resume's checkpoint")
    a = p.parse_args(argv)

    import torch
    if a.threads:
        torch.set_num_threads(a.threads)

    if a.compare_only and not a.resume:
        p.error("--compare-only needs --resume <state_dict.npz> to know "
                "which checkpoint to compare")
    init_sd = dict(np.load(a.resume)) if a.resume else None
    if a.compare_only:
        sd, curve, train_s = init_sd, [1.0, 1.0], 0.0
    else:
        t0 = time.time()
        sd, curve = train_reference(a.steps, a.batch_size, a.n_scenes,
                                    lr=a.lr, init_sd=init_sd)
        train_s = time.time() - t0
        if a.out:
            os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
            np.savez_compressed(a.out, **sd)
    stats = compare(sd)
    diag = compare(sd, mask_mode="analytic")
    stats.update(sensitivity_probe(sd))
    stats.update({
        "steps": a.steps,
        "train_s": round(train_s, 1),
        "flow_loss_first10": round(float(np.mean(curve[:10])), 4),
        "flow_loss_last10": round(float(np.mean(curve[-10:])), 4),
        # diagnostic: same checkpoint with the chaotic mask replaced by
        # the analytic interior mask on both sides — isolates mask-bit
        # chaos from all other arithmetic
        "analytic_xim_epe_mean": diag["xim_epe_mean"],
        "analytic_xim_pct_gt_0p1px": diag["xim_pct_gt_0p1px"],
        "analytic_occ_prob_mad": diag["occ_prob_mad"],
    })
    print(json.dumps(stats))
    return stats


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    main()
