"""Trained-weights whole-model fidelity gate (VERDICT r4 missing #1).

Trains the ACTUAL torch reference IRR_PWC (/root/reference/models/
IRR_PWC.py:51-184) for a short CPU run on synth scenes with the
reference's own loss (losses.py:515-571), converts the real trained
``state_dict()`` through ``irr_tpu.convert``, and asserts UNPATCHED
eval-output parity statistically — no mask patching, no random-init
excuses. Complements tests/test_fidelity.py (which pins the arithmetic
bit-level at random init but must patch the chaotic warp mask): a trained
checkpoint's smooth flows damp the mask-flip cascade, so the two
implementations must agree to sub-0.1-px mean discrepancy and their
EPE/F1-vs-ground-truth metrics must match to a fraction of a percent.

The one harness subtlety (measured the hard way): modern torch rejects
the reference ``rescale_flow``'s in-place-on-chunk-views code under
autograd, so the torch side (training AND eval) runs a ``mul_`` replica
that keeps the IN-PLACE mutation semantics (pwc_modules.py:70-82; the
side effect at IRR_PWC.py:128-135 double-scales flow_cont, and our jax
model replicates that quirk). A side-effect-free patch produces a
DIFFERENT model: 3.34 px cross-impl EPE, which collapses to 0.007 px —
the model's own input-perturbation chaos floor — with the faithful
replica. "Unpatched" in this gate means the chaotic warp MASK is left
as-is on both sides. The analytic-mask diagnostic at the same
checkpoint reads 1.6e-6 px: every non-mask op is at bit-level parity
on trained weights.

Gated behind IRR_TPU_SLOW_TESTS=1 (one CPU core: the torch training run
dominates at roughly 7 s/step). The 150-step reference run this pins
against is recorded in RESULTS.md ("Trained-checkpoint fidelity");
thresholds here carry wide margin over those measured values.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("IRR_TPU_SLOW_TESTS"),
    reason="slow (trains the torch reference model); set IRR_TPU_SLOW_TESTS=1")


def test_trained_checkpoint_unpatched_parity():
    from perf.ref_fidelity import train_reference, compare

    steps = int(os.environ.get("IRR_TPU_REF_FID_STEPS", "150"))
    sd, curve = train_reference(steps)

    # the torch run must actually have trained (off the chaotic regime);
    # measured at 150 steps: last10/first10 = 0.49 (80 steps is too
    # short: 0.74 — the batch-resampled loss curve is noisy)
    assert np.mean(curve[-10:]) < 0.75 * np.mean(curve[:10]), (
        np.mean(curve[:10]), np.mean(curve[-10:]))

    stats = compare(sd)
    # conversion exercised a REAL trained torch state_dict: convert.py's
    # load_into_params asserts zero missing/mismatched/unused keys inside
    # compare(); here we gate the statistical output parity.
    # (measured at 150 steps: xim_epe_mean 0.007 px ~= the intrinsic
    # chaos floor, 0% > 0.5 px, occ_prob_mad 0.006, label disagree 0.8%)
    assert stats["xim_epe_mean"] < 0.10, stats
    assert stats["xim_pct_gt_0p5px"] < 1.0, stats
    assert stats["occ_prob_mad"] < 0.02, stats
    assert stats["occ_label_disagree_pct"] < 3.0, stats
    # metric parity: both implementations score the held-out scenes alike
    assert abs(stats["epe_torch"] - stats["epe_ours"]) < 0.05 * max(
        stats["epe_torch"], 1e-6), stats
    assert abs(stats["f1_torch"] - stats["f1_ours"]) < 0.02, stats
    # the non-mask arithmetic must hold bit-level parity on trained
    # weights (analytic interior mask on both sides; measured 1.6e-6 px)
    diag = compare(sd, mask_mode="analytic")
    assert diag["xim_epe_mean"] < 1e-3, diag
