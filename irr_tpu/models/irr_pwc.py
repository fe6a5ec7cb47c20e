"""IRR-PWC — the paper's full model (reference models/IRR_PWC.py:14-184).

Structure per pyramid level l<=4 (shared weights across all levels):
warp both directions -> bidirectional cost volumes -> shared dense flow
estimator (+context net, residual) -> shared occ estimator (+context) ->
RefineFlow on detached flow with image-warp error -> RefineOcc on detached
occ with feature-warp error. Levels 5-6: bilinear flow upsample +
OccUpsampleNetwork with warped-image/flow guidance.

TPU-first restructuring (math identical, verified in tests): the forward
and backward directions are STACKED along the batch axis and the entire
level body runs once on batch 2B. The reference runs every submodule twice
(IRR_PWC.py:90-91,108-109,...); stacking doubles the effective matmul batch
feeding the MXU and halves dispatch overhead. Direction pairing is realized
by `_swap` (exchanging the two halves), e.g. warping the swapped feature
stack by the flow stack yields [warp(x2, flow_f); warp(x1, flow_b)].
"""

import jax
import jax.numpy as jnp

from ..nn.core import Module, Conv, cat_features, model_inputs
from ..nn.pwc import (FeatureExtractor, FlowEstimatorDense, OccEstimatorDense,
                      ContextNetwork, OccContextNetwork)
from ..nn.irr import OccUpsampleNetwork, RefineFlow, RefineOcc
from ..ops.cost_volume import cost_volume
from ..ops.warp import warp_masked, warp_multi
from ..ops.resize import upsample2d_as, rescale_flow

NUM_CHS = [3, 16, 32, 64, 96, 128, 196]
SEARCH_RANGE = 4
DIM_CORR = (SEARCH_RANGE * 2 + 1) ** 2
OUTPUT_LEVEL = 4
NUM_LEVELS = 7


def _swap(x):
    b = x.shape[0] // 2
    return jnp.concatenate([x[b:], x[:b]], axis=0)


class IRR_PWC(Module):
    """ctor mirrors the reference contract: (args, div_flow=0.05)."""

    def __init__(self, args=None, div_flow=0.05, approx_guidance=False,
                 approx_guidance_stride=2, approx_refine_guidance=False,
                 grouped_towers=False):
        self.args = args
        self.div_flow = float(div_flow)
        # --model_approx_guidance=True: reduced-density L5/L6 guidance
        # warps (ops/warp.py warp_multi approx mode). OFF by default —
        # the default path stays reference-exact; opt in for stride^2-fold
        # fewer full-res gather descriptors at a small guidance-fidelity
        # cost. --model_approx_guidance_stride picks the subsampling
        # stride (2 = the measured zero-EPE-cost fast mode, RESULTS.md;
        # 4 = 16x fewer descriptors, more fidelity risk at motion edges).
        self.approx_guidance = bool(approx_guidance)
        self.approx_guidance_stride = int(approx_guidance_stride)
        assert self.approx_guidance_stride >= 2
        # --model_approx_refine_guidance=True: apply the same reduced-
        # density warp to the two L1-4 refinement GUIDANCE warps (the
        # warped-image error feeding RefineFlow, IRR_PWC.py:126-138, and
        # the warped-feature error feeding RefineOcc). These warps only
        # steer the refinement networks — the cost-volume feature warp
        # stays exact — but unlike the L5/L6 guidance they sit upstream
        # of the carried flow estimate, so the EPE cost must be measured
        # (RESULTS.md) before production use. Uses approx_guidance_stride.
        self.approx_refine_guidance = bool(approx_refine_guidance)
        # --model_grouped_towers=True: run each level's flow+occ estimator
        # and context-net pairs as feature_group_count=2 grouped convs
        # (nn/pwc.py grouped_flow_occ_stage), half the conv dispatches.
        # Exact same math in f32 (pinned bit-identical on a trained
        # checkpoint, perf/repro_grouped_mismatch.py); under bf16 the
        # different accumulation order is amplified by the iterative
        # refinement to a measured EPE cost (RESULTS.md) — opt-in only.
        self.grouped_towers = bool(grouped_towers)

        self.extractor = FeatureExtractor(NUM_CHS)
        ch_in_flo = DIM_CORR + 32 + 2
        ch_in_occ = DIM_CORR + 32 + 1
        self.flow_estimators = FlowEstimatorDense(ch_in_flo)
        self.context_networks = ContextNetwork(ch_in_flo + 448 + 2)
        self.occ_estimators = OccEstimatorDense(ch_in_occ)
        self.occ_context_networks = OccContextNetwork(ch_in_occ + 448 + 1)
        self.occ_shuffle_upsample = OccUpsampleNetwork(11, 1)
        # 4 entries; at l == output_level x1 already has 32 channels
        # (IRR_PWC.py:38-41,97-102)
        self.conv_1x1 = [Conv(c, 32, kernel_size=1) for c in (196, 128, 96, 64)]
        self.conv_1x1_1 = Conv(16, 3, kernel_size=1)
        self.refine_flow = RefineFlow(2 + 1 + 32)
        self.refine_occ = RefineOcc(1 + 32 + 32)

    def init(self, key):
        return {
            "feature_pyramid_extractor": self.extractor.init(jax.random.fold_in(key, 0)),
            "flow_estimators": self.flow_estimators.init(jax.random.fold_in(key, 1)),
            "context_networks": self.context_networks.init(jax.random.fold_in(key, 2)),
            "occ_estimators": self.occ_estimators.init(jax.random.fold_in(key, 3)),
            "occ_context_networks": self.occ_context_networks.init(jax.random.fold_in(key, 4)),
            "occ_shuffle_upsample": self.occ_shuffle_upsample.init(jax.random.fold_in(key, 5)),
            "conv_1x1": [c.init(jax.random.fold_in(key, 10 + i))
                         for i, c in enumerate(self.conv_1x1)],
            "conv_1x1_1": self.conv_1x1_1.init(jax.random.fold_in(key, 6)),
            "refine_flow": self.refine_flow.init(jax.random.fold_in(key, 7)),
            "refine_occ": self.refine_occ.init(jax.random.fold_in(key, 8)),
        }

    def __call__(self, params, input_dict, training=False):
        return self.apply(params, input_dict, training)

    def apply(self, params, input_dict, training=False):
        x1_raw, x2_raw = model_inputs(input_dict)
        b, height_im, width_im, _ = x1_raw.shape
        dvf = self.div_flow

        # Stacked siamese pyramid: P[l] = [x1_l ; x2_l] on batch axis.
        raw = jnp.concatenate([x1_raw, x2_raw], axis=0)
        pyr = self.extractor(params["feature_pyramid_extractor"], raw)
        pyr = pyr + [raw]

        flows, occs = [], []
        b2, h0, w0, _ = pyr[0].shape
        flow = jnp.zeros((b2, h0, w0, 2), jnp.float32)   # [flow_f ; flow_b]
        occ = jnp.zeros((b2, h0, w0, 1), jnp.float32)    # [occ_f ; occ_b]

        def unstack(t):
            return t[:b], t[b:]

        for l in range(NUM_LEVELS):
            x = pyr[l]
            x_sw = _swap(x)

            if l <= OUTPUT_LEVEL:
                if l == 0:
                    x_warp = x_sw
                else:
                    flow = upsample2d_as(flow, x)
                    occ = upsample2d_as(occ, x)
                    x_warp = warp_masked(x_sw, flow, height_im, width_im, dvf)

                corr = cost_volume(x, x_warp, SEARCH_RANGE, relu=True)

                if l != OUTPUT_LEVEL:
                    x_1by1 = self.conv_1x1[l](params["conv_1x1"][l], x)
                else:
                    x_1by1 = x

                flow = rescale_flow(flow, dvf, width_im, height_im, True)

                if self.grouped_towers:
                    from ..nn.pwc import grouped_flow_occ_stage
                    flow_cont, occ_cont = grouped_flow_occ_stage(
                        params["flow_estimators"], params["occ_estimators"],
                        params["context_networks"],
                        params["occ_context_networks"],
                        corr, x_1by1, flow, occ)
                else:
                    x_intm, flow_res = self.flow_estimators(
                        params["flow_estimators"], cat_features(corr, x_1by1, flow))
                    flow_est = flow + flow_res
                    flow_cont = flow_est + self.context_networks(
                        params["context_networks"], cat_features(x_intm, flow_est))

                    x_intm_occ, occ_res = self.occ_estimators(
                        params["occ_estimators"], cat_features(corr, x_1by1, occ))
                    occ_est = occ + occ_res
                    occ_cont = occ_est + self.occ_context_networks(
                        params["occ_context_networks"], cat_features(x_intm_occ, occ_est))

                # bilateral refinement with warped full-res images
                # (IRR_PWC.py:126-138). QUIRK, replicated mechanically: the
                # reference rescale_flow mutates its input IN PLACE (chunk
                # views + `u *= scale`, pwc_modules.py:78-80), so the
                # rescale inside the warp call at IRR_PWC.py:128 converts
                # flow_cont to global units as a SIDE EFFECT; RefineFlow
                # then receives the GLOBAL-unit flow and the "rescale" at
                # :135 scales flow_cont a second time. Verified against the
                # actual torch model in tests/test_fidelity.py.
                img_resize = upsample2d_as(raw, flow)
                flow_cont = rescale_flow(flow_cont, dvf, width_im, height_im, False)
                # Eval-only: the refine guidance warps carry gradients into
                # flow_cont (only the direct refine input is stop_gradient'ed,
                # matching the reference detach at IRR_PWC.py:132,141), so
                # enabling the approximation during training would silently
                # change gradient paths. The flag is a measurement/serving
                # knob; training always uses the exact warps.
                _refine_approx = (self.approx_guidance_stride
                                  if (self.approx_refine_guidance
                                      and not training) else False)
                if _refine_approx:
                    img_warp, = warp_multi([_swap(img_resize)], flow_cont,
                                           height_im, width_im, dvf,
                                           approx=_refine_approx)
                else:
                    img_warp = warp_masked(_swap(img_resize), flow_cont,
                                           height_im, width_im, dvf)
                flow_ref = self.refine_flow(
                    params["refine_flow"], jax.lax.stop_gradient(flow_cont),
                    img_resize - img_warp, x_1by1)

                flow_cont = rescale_flow(flow_cont, dvf, width_im, height_im, False)
                flow_ref = rescale_flow(flow_ref, dvf, width_im, height_im, False)

                if _refine_approx:
                    x_1by1_warp, = warp_multi([_swap(x_1by1)], flow_ref,
                                              height_im, width_im, dvf,
                                              approx=_refine_approx)
                else:
                    x_1by1_warp = warp_masked(_swap(x_1by1), flow_ref,
                                              height_im, width_im, dvf)
                occ_ref = self.refine_occ(
                    params["refine_occ"], jax.lax.stop_gradient(occ_cont),
                    x_1by1, x_1by1 - x_1by1_warp)

                fc_f, fc_b = unstack(flow_cont)
                fr_f, fr_b = unstack(flow_ref)
                oc_f, oc_b = unstack(occ_cont)
                or_f, or_b = unstack(occ_ref)
                flows.append([fc_f, fc_b, fr_f, fr_b])
                occs.append([oc_f, oc_b, or_f, or_b])
                flow = flow_ref
                occ = occ_ref
            else:
                flow = upsample2d_as(flow, x)
                f_f, f_b = unstack(flow)
                flows.append([f_f, f_b])

                # Stacked-batch invariants (trace-time): flow always carries
                # both directions ([flow_f ; flow_b], batch 2B); occ is 2B in
                # training, and in eval is 2B on the FIRST post-output level
                # (before the forward-only slice below) then B afterwards.
                # Any other population means the forward/backward halves have
                # been mis-paired upstream.
                assert flow.shape[0] == b2, (
                    "L%d: flow batch %d != stacked 2B=%d" % (l, flow.shape[0], b2))
                assert occ.shape[0] == (b2 if training else
                                        (b2 if l == OUTPUT_LEVEL + 1 else b)), (
                    "L%d: occ batch %d violates the stacked/eval-forward-only "
                    "population contract (B=%d, training=%s)"
                    % (l, occ.shape[0], b, training))

                if not training and occ.shape[0] == b2:
                    # eval returns only the FORWARD occlusion: the backward
                    # occ branch at levels 5-6 never reaches the output, so
                    # drop it here (exactly the same returned values, half
                    # the full-resolution warp + conv work).
                    occ = occ[:b]
                if occ.shape[0] == b:  # eval, forward-only
                    x_warp, flow_warp = warp_multi(
                        [x_sw[:b], _swap(flow)[:b]], flow[:b],
                        height_im, width_im, dvf,
                        approx=(self.approx_guidance_stride
                                if self.approx_guidance else False))
                    x_half = x[:b]
                    fl = flow[:b]
                else:
                    x_warp, flow_warp = warp_multi(
                        [x_sw, _swap(flow)], flow, height_im, width_im, dvf,
                        approx=(self.approx_guidance_stride
                                if self.approx_guidance else False))
                    x_half = x
                    fl = flow

                if l != NUM_LEVELS - 1:
                    x_in = self.conv_1x1_1(params["conv_1x1_1"], x_half)
                    x_w_in = self.conv_1x1_1(params["conv_1x1_1"], x_warp)
                else:
                    x_in = x_half
                    x_w_in = x_warp

                guidance = cat_features(x_in, x_w_in, fl, flow_warp)
                occ = self.occ_shuffle_upsample(params["occ_shuffle_upsample"], occ, guidance)
                if training:
                    o_f, o_b = unstack(occ)
                    occs.append([o_f, o_b])

        if training:
            return {"flow": flows, "occ": occs}
        flow_f = flow[:b]
        occ_f = occ
        return {
            "flow": upsample2d_as(flow_f, x1_raw) * (1.0 / dvf),
            "occ": upsample2d_as(occ_f, x1_raw),
        }
