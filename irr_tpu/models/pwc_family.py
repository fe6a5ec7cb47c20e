"""The 8 PWC-Net ablation variants (reference models/pwcnet*.py).

Two cores:
  - `_PWCPlain`: per-level independent FlowEstimatorDense ModuleList, context
    net only at the output level (pwcnet.py:23-37, pwcnet_bi.py,
    pwcnet_occ.py, pwcnet_occ_bi.py).
  - `_PWCIrr`: one estimator + context net shared across all 5 levels, with
    per-level 1x1 convs to 32ch and flow rescaled to level-local units
    (pwcnet_irr.py:23-34 and _bi/_occ/_occ_bi variants).

Design stance: the level loop stays an unrolled Python loop inside one
jitted function (shapes differ per level); weight sharing, not scan, gives
the IRR property. NHWC everywhere.
"""

import jax
import jax.numpy as jnp

from ..nn.core import Module, Conv, cat_features, model_inputs
from ..nn.pwc import (FeatureExtractor, FlowEstimatorDense, OccEstimatorDense,
                      ContextNetwork, OccContextNetwork)
from ..ops.cost_volume import cost_volume
from ..ops.warp import warp_masked
from ..ops.resize import upsample2d_as, rescale_flow

NUM_CHS = [3, 16, 32, 64, 96, 128, 196]
SEARCH_RANGE = 4
DIM_CORR = (SEARCH_RANGE * 2 + 1) ** 2
OUTPUT_LEVEL = 4


def _zeros_like_level(x, ch):
    b, h, w, _ = x.shape
    return jnp.zeros((b, h, w, ch), jnp.float32)


class _PWCBase(Module):
    def __init__(self, args=None, div_flow=0.05, *, occ: bool, bi: bool):
        self.args = args
        self.div_flow = float(div_flow)
        self.occ = occ
        self.bi = bi
        self.extractor = FeatureExtractor(NUM_CHS)

    def __call__(self, params, input_dict, training=False):
        return self.apply(params, input_dict, training)

    def _pyramids(self, params, x1_raw, x2_raw):
        # Siamese extraction: one batched pass over the stacked pair halves
        # the number of conv dispatches (pure TPU perf; math unchanged).
        b = x1_raw.shape[0]
        stacked = jnp.concatenate([x1_raw, x2_raw], axis=0)
        pyr = self.extractor(params["feature_pyramid_extractor"], stacked)
        x1_pyr = [p[:b] for p in pyr] + [x1_raw]
        x2_pyr = [p[b:] for p in pyr] + [x2_raw]
        return x1_pyr, x2_pyr


class _PWCPlain(_PWCBase):
    """Per-level estimators (pwcnet.py / _bi / _occ / _occ_bi)."""

    def __init__(self, args=None, div_flow=0.05, *, occ: bool, bi: bool):
        super().__init__(args, div_flow, occ=occ, bi=bi)
        self.flow_estimators = []
        self.occ_estimators = []
        for l, ch in enumerate(NUM_CHS[::-1]):
            if l > OUTPUT_LEVEL:
                break
            ch_in = DIM_CORR if l == 0 else DIM_CORR + ch + 2
            self.flow_estimators.append(FlowEstimatorDense(ch_in))
            if occ:
                ch_in_occ = DIM_CORR if l == 0 else DIM_CORR + ch + 1
                self.occ_estimators.append(OccEstimatorDense(ch_in_occ))
        self.context_networks = ContextNetwork(DIM_CORR + 32 + 2 + 448 + 2)
        if occ:
            self.occ_context_networks = OccContextNetwork(DIM_CORR + 32 + 1 + 448 + 1)

    def init(self, key):
        p = {
            "feature_pyramid_extractor": self.extractor.init(jax.random.fold_in(key, 0)),
            "flow_estimators": [e.init(jax.random.fold_in(key, 10 + i))
                                for i, e in enumerate(self.flow_estimators)],
            "context_networks": self.context_networks.init(jax.random.fold_in(key, 1)),
        }
        if self.occ:
            p["occ_estimators"] = [e.init(jax.random.fold_in(key, 20 + i))
                                   for i, e in enumerate(self.occ_estimators)]
            p["occ_context_networks"] = self.occ_context_networks.init(
                jax.random.fold_in(key, 2))
        return p

    def apply(self, params, input_dict, training=False):
        x1_raw, x2_raw = model_inputs(input_dict)
        _, height_im, width_im, _ = x1_raw.shape
        x1_pyr, x2_pyr = self._pyramids(params, x1_raw, x2_raw)

        flows, occs = [], []
        flow_f = flow_b = occ_f = occ_b = None
        x_intm_f = x_intm_b = x_intm_occ_f = x_intm_occ_b = None

        for l, (x1, x2) in enumerate(zip(x1_pyr, x2_pyr)):
            if l == 0:
                x2_warp = x2
                x1_warp = x1
            else:
                flow_f = upsample2d_as(flow_f, x1)
                x2_warp = warp_masked(x2, flow_f, height_im, width_im, self.div_flow)
                if self.bi:
                    flow_b = upsample2d_as(flow_b, x2)
                    x1_warp = warp_masked(x1, flow_b, height_im, width_im, self.div_flow)
                if self.occ:
                    occ_f = upsample2d_as(occ_f, x1)
                    if self.bi:
                        occ_b = upsample2d_as(occ_b, x2)

            corr_f = cost_volume(x1, x2_warp, SEARCH_RANGE, relu=True)
            if self.bi:
                corr_b = cost_volume(x2, x1_warp, SEARCH_RANGE, relu=True)

            est = self.flow_estimators[l]
            pe = params["flow_estimators"][l]
            if l == 0:
                x_intm_f, flow_f = est(pe, corr_f)
                if self.bi:
                    x_intm_b, flow_b = est(pe, corr_b)
            else:
                x_intm_f, flow_f = est(pe, cat_features(corr_f, x1, flow_f))
                if self.bi:
                    x_intm_b, flow_b = est(pe, cat_features(corr_b, x2, flow_b))

            if self.occ:
                oest = self.occ_estimators[l]
                poe = params["occ_estimators"][l]
                if l == 0:
                    x_intm_occ_f, occ_f = oest(poe, corr_f)
                    if self.bi:
                        x_intm_occ_b, occ_b = oest(poe, corr_b)
                else:
                    x_intm_occ_f, occ_f = oest(poe, cat_features(corr_f, x1, occ_f))
                    if self.bi:
                        # NOTE: the reference concatenates x1 (not x2) here
                        # (pwcnet_occ_bi.py:104); mirrored for parity.
                        x_intm_occ_b, occ_b = oest(poe, cat_features(corr_b, x1, occ_b))

            if l != OUTPUT_LEVEL:
                flows.append([flow_f, flow_b] if self.bi else flow_f)
                if self.occ:
                    occs.append([occ_f, occ_b] if self.bi else occ_f)
            else:
                pc = params["context_networks"]
                flow_f = flow_f + self.context_networks(pc, cat_features(x_intm_f, flow_f))
                if self.bi:
                    flow_b = flow_b + self.context_networks(pc, cat_features(x_intm_b, flow_b))
                flows.append([flow_f, flow_b] if self.bi else flow_f)
                if self.occ:
                    poc = params["occ_context_networks"]
                    occ_f = occ_f + self.occ_context_networks(
                        poc, cat_features(x_intm_occ_f, occ_f))
                    if self.bi:
                        occ_b = occ_b + self.occ_context_networks(
                            poc, cat_features(x_intm_occ_b, occ_b))
                    occs.append([occ_f, occ_b] if self.bi else occ_f)
                break

        if training:
            out = {"flow": flows}
            if self.occ:
                out["occ"] = occs
            return out
        out = {"flow": upsample2d_as(flow_f, x1_raw) * (1.0 / self.div_flow)}
        if self.occ:
            out["occ"] = upsample2d_as(occ_f, x1_raw)
        return out


class _PWCIrr(_PWCBase):
    """Weight-shared (IRR-over-levels) estimators (pwcnet_irr*.py)."""

    def __init__(self, args=None, div_flow=0.05, *, occ: bool, bi: bool):
        super().__init__(args, div_flow, occ=occ, bi=bi)
        ch_in_flo = DIM_CORR + 32 + 2
        ch_in_occ = DIM_CORR + 32 + 1
        self.flow_estimators = FlowEstimatorDense(ch_in_flo)
        self.context_networks = ContextNetwork(ch_in_flo + 448 + 2)
        if occ:
            self.occ_estimators = OccEstimatorDense(ch_in_occ)
            self.occ_context_networks = OccContextNetwork(ch_in_occ + 448 + 1)
        self.conv_1x1 = [Conv(c, 32, kernel_size=1) for c in (196, 128, 96, 64, 32)]

    def init(self, key):
        p = {
            "feature_pyramid_extractor": self.extractor.init(jax.random.fold_in(key, 0)),
            "flow_estimators": self.flow_estimators.init(jax.random.fold_in(key, 1)),
            "context_networks": self.context_networks.init(jax.random.fold_in(key, 2)),
            "conv_1x1": [c.init(jax.random.fold_in(key, 10 + i))
                         for i, c in enumerate(self.conv_1x1)],
        }
        if self.occ:
            p["occ_estimators"] = self.occ_estimators.init(jax.random.fold_in(key, 3))
            p["occ_context_networks"] = self.occ_context_networks.init(
                jax.random.fold_in(key, 4))
        return p

    def apply(self, params, input_dict, training=False):
        x1_raw, x2_raw = model_inputs(input_dict)
        _, height_im, width_im, _ = x1_raw.shape
        x1_pyr, x2_pyr = self._pyramids(params, x1_raw, x2_raw)

        flows, occs = [], []
        flow_f = _zeros_like_level(x1_pyr[0], 2)
        flow_b = _zeros_like_level(x1_pyr[0], 2)
        occ_f = _zeros_like_level(x1_pyr[0], 1)
        occ_b = _zeros_like_level(x1_pyr[0], 1)

        for l, (x1, x2) in enumerate(zip(x1_pyr, x2_pyr)):
            if l == 0:
                x2_warp = x2
                x1_warp = x1
            else:
                flow_f = upsample2d_as(flow_f, x1)
                x2_warp = warp_masked(x2, flow_f, height_im, width_im, self.div_flow)
                if self.bi:
                    flow_b = upsample2d_as(flow_b, x2)
                    x1_warp = warp_masked(x1, flow_b, height_im, width_im, self.div_flow)
                if self.occ:
                    occ_f = upsample2d_as(occ_f, x1)
                    if self.bi:
                        occ_b = upsample2d_as(occ_b, x2)

            corr_f = cost_volume(x1, x2_warp, SEARCH_RANGE, relu=True)
            if self.bi:
                corr_b = cost_volume(x2, x1_warp, SEARCH_RANGE, relu=True)

            flow_f = rescale_flow(flow_f, self.div_flow, width_im, height_im, True)
            if self.bi:
                flow_b = rescale_flow(flow_b, self.div_flow, width_im, height_im, True)

            x1_1by1 = self.conv_1x1[l](params["conv_1x1"][l], x1)
            if self.bi:
                x2_1by1 = self.conv_1x1[l](params["conv_1x1"][l], x2)

            pe, est = params["flow_estimators"], self.flow_estimators
            x_intm_f, res_f = est(pe, cat_features(corr_f, x1_1by1, flow_f))
            flow_f = flow_f + res_f
            if self.bi:
                x_intm_b, res_b = est(pe, cat_features(corr_b, x2_1by1, flow_b))
                flow_b = flow_b + res_b

            pc, ctx = params["context_networks"], self.context_networks
            flow_f = flow_f + ctx(pc, cat_features(x_intm_f, flow_f))
            if self.bi:
                flow_b = flow_b + ctx(pc, cat_features(x_intm_b, flow_b))

            flow_f = rescale_flow(flow_f, self.div_flow, width_im, height_im, False)
            if self.bi:
                flow_b = rescale_flow(flow_b, self.div_flow, width_im, height_im, False)
            flows.append([flow_f, flow_b] if self.bi else flow_f)

            if self.occ:
                poe, oest = params["occ_estimators"], self.occ_estimators
                x_io_f, ores_f = oest(poe, cat_features(corr_f, x1_1by1, occ_f))
                occ_f = occ_f + ores_f
                if self.bi:
                    x_io_b, ores_b = oest(poe, cat_features(corr_b, x2_1by1, occ_b))
                    occ_b = occ_b + ores_b
                poc, octx = params["occ_context_networks"], self.occ_context_networks
                occ_f = occ_f + octx(poc, cat_features(x_io_f, occ_f))
                if self.bi:
                    occ_b = occ_b + octx(poc, cat_features(x_io_b, occ_b))
                occs.append([occ_f, occ_b] if self.bi else occ_f)

            if l == OUTPUT_LEVEL:
                break

        if training:
            out = {"flow": flows}
            if self.occ:
                out["occ"] = occs
            return out
        out = {"flow": upsample2d_as(flow_f, x1_raw) * (1.0 / self.div_flow)}
        if self.occ:
            out["occ"] = upsample2d_as(occ_f, x1_raw)
        return out


class PWCNet(_PWCPlain):
    """Baseline PWC-Net (reference models/pwcnet.py)."""

    def __init__(self, args=None, div_flow=0.05):
        super().__init__(args, div_flow, occ=False, bi=False)


class PWCNet_bi(_PWCPlain):
    """Bidirectional PWC-Net (reference models/pwcnet_bi.py)."""

    def __init__(self, args=None, div_flow=0.05):
        super().__init__(args, div_flow, occ=False, bi=True)


class PWCNet_occ(_PWCPlain):
    """PWC-Net + occlusion decoder (reference models/pwcnet_occ.py)."""

    def __init__(self, args=None, div_flow=0.05):
        super().__init__(args, div_flow, occ=True, bi=False)


class PWCNet_occ_bi(_PWCPlain):
    """Bidirectional + occlusion (reference models/pwcnet_occ_bi.py)."""

    def __init__(self, args=None, div_flow=0.05):
        super().__init__(args, div_flow, occ=True, bi=True)


class PWCNet_irr(_PWCIrr):
    """IRR-over-levels, shared estimator (reference models/pwcnet_irr.py)."""

    def __init__(self, args=None, div_flow=0.05):
        super().__init__(args, div_flow, occ=False, bi=False)


class PWCNet_irr_bi(_PWCIrr):
    """Shared estimator, both directions (reference models/pwcnet_irr_bi.py)."""

    def __init__(self, args=None, div_flow=0.05):
        super().__init__(args, div_flow, occ=False, bi=True)


class PWCNet_irr_occ(_PWCIrr):
    """Shared flow+occ estimators (reference models/pwcnet_irr_occ.py)."""

    def __init__(self, args=None, div_flow=0.05):
        super().__init__(args, div_flow, occ=True, bi=False)


class PWCNet_irr_occ_bi(_PWCIrr):
    """Shared flow+occ, bidirectional (reference models/pwcnet_irr_occ_bi.py)."""

    def __init__(self, args=None, div_flow=0.05):
        super().__init__(args, div_flow, occ=True, bi=True)
