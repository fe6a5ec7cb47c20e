"""Multi-scale training losses and eval metrics (reference losses.py).

All 13 classes, same names, same math. Contract:
`loss(output_dict, target_dict, training) -> loss_dict` with `total_loss`
(training) or `epe` (+`F1`/`outlier`) (eval). Tensors NHWC.

Notes vs the reference:
  - data-dependent branching for flow/occ auto-balancing
    (losses.py:194-205 etc.) becomes `jnp.where` so it traces under jit;
  - the in-place `.detach()` mutations of unused backward outputs
    (losses.py:610,617,677,682-683) are no-ops for the loss value and
    gradient (those tensors never enter the loss), so they are omitted;
  - KITTI's per-image boolean indexing (losses.py:670-675) becomes a
    masked reduction (identical value and gradient, jit-compatible).
"""

import jax
import jax.numpy as jnp

from .nn.core import safe_norm
from .ops.resize import downsample2d_as, upsample2d_as


def _elementwise_epe(input_flow, target_flow):
    return safe_norm(target_flow - input_flow, axis=-1, keepdims=True)


def _elementwise_robust_epe_char(input_flow, target_flow):
    return (safe_norm(target_flow - input_flow, axis=-1, keepdims=True) + 0.01) ** 0.4


def f1_score(y_true, y_pred, eps=1e-8):
    """Occlusion F1 eval metric (losses.py:24-37); inputs NHWC {0,1}."""
    tp = jnp.sum(y_pred * y_true, axis=(1, 2))
    precision = tp / (jnp.sum(y_pred, axis=(1, 2)) + eps)
    recall = tp / (jnp.sum(y_true, axis=(1, 2)) + eps)
    return jnp.mean(precision * recall / (precision + recall + eps) * 2)


def f1_score_bal_loss(y_pred, y_true, eps=1e-8):
    """Balanced F1 BCE (losses.py:39-48); y_pred is sigmoid output, NHWC."""
    tp = -jnp.sum(y_true * jnp.log(y_pred + eps), axis=(1, 2, 3))
    fn = -jnp.sum((1 - y_true) * jnp.log((1 - y_pred) + eps), axis=(1, 2, 3))
    denom_tp = (jnp.sum(y_true, axis=(1, 2, 3)) + jnp.sum(y_pred, axis=(1, 2, 3)) + eps)
    denom_fn = (jnp.sum(1 - y_true, axis=(1, 2, 3)) + jnp.sum(1 - y_pred, axis=(1, 2, 3)) + eps)
    h, w = y_pred.shape[1], y_pred.shape[2]
    return (jnp.sum(tp / denom_tp) + jnp.sum(fn / denom_fn)) * h * w * 0.5


def _bce_sum(y_pred, y_true, eps=1e-12):
    """nn.BCELoss(reduction='sum') on sigmoid outputs (losses.py:589)."""
    y_pred = jnp.clip(y_pred, eps, 1 - eps)
    return -jnp.sum(y_true * jnp.log(y_pred) + (1 - y_true) * jnp.log(1 - y_pred))


def _balance(flow_loss, occ_loss):
    """Auto loss balancing by detached magnitudes (losses.py:194-205)."""
    f = jax.lax.stop_gradient(flow_loss)
    o = jax.lax.stop_gradient(occ_loss)
    f_w = jnp.where(f > o, 1.0, o / f)
    o_w = jnp.where(f > o, f / o, 1.0)
    return flow_loss * f_w + occ_loss * o_w


class _LossBase:
    def __init__(self, args=None, batch_size=None, div_flow=None, num_iters=None):
        self._args = args
        self._batch_size = batch_size if batch_size is not None else getattr(args, "batch_size", 1)
        self._div_flow = div_flow if div_flow is not None else getattr(args, "model_div_flow", 0.05)
        self._num_iters = num_iters if num_iters is not None else getattr(args, "num_iters", 1)

    def __call__(self, output_dict, target_dict, training=False):
        raise NotImplementedError


_FLOWNET_WEIGHTS = [0.005, 0.01, 0.02, 0.08, 0.32]
_PWC_WEIGHTS = [0.32, 0.08, 0.02, 0.01, 0.005]
_PWC_UP_WEIGHTS = [0.32, 0.08, 0.02, 0.01, 0.005, 0.00125, 0.0003125]
_FLOWNET_UP_WEIGHTS = [0.0003125, 0.00125, 0.005, 0.01, 0.02, 0.08, 0.32]
_KITTI_WEIGHTS = [0.001, 0.001, 0.001, 0.002, 0.004, 0.004, 0.004]


class MultiScaleEPE_FlowNet(_LossBase):
    """Pairs with FlowNet1S (losses.py:51-82)."""

    def __call__(self, output_dict, target_dict, training=False):
        ld = {}
        if training:
            target = self._div_flow * target_dict["target1"]
            total = 0.0
            for i, key in enumerate(["flow2", "flow3", "flow4", "flow5", "flow6"]):
                out = output_dict[key]
                epe = _elementwise_epe(out, downsample2d_as(target, out))
                total = total + _FLOWNET_WEIGHTS[i] * jnp.sum(epe) / self._batch_size
                ld[f"epe{i + 2}"] = jnp.mean(epe)
            ld["total_loss"] = total
        else:
            ld["epe"] = jnp.mean(_elementwise_epe(output_dict["flow1"], target_dict["target1"]))
        return ld


class MultiScaleEPE_FlowNet_IRR(_LossBase):
    """flownet1s_irr: iteration lists, /num_iters (losses.py:84-118)."""

    def __call__(self, output_dict, target_dict, training=False):
        ld = {}
        if training:
            target = self._div_flow * target_dict["target1"]
            total = 0.0
            for i, key in enumerate(["flow2", "flow3", "flow4", "flow5", "flow6"]):
                outs = output_dict[key]
                target_i = downsample2d_as(target, outs[0])
                for out in outs:
                    epe = _elementwise_epe(out, target_i)
                    total = total + _FLOWNET_WEIGHTS[i] * jnp.sum(epe)
                    ld[f"epe{i + 2}"] = jnp.mean(epe)
            ld["total_loss"] = total / self._batch_size / self._num_iters
        else:
            ld["epe"] = jnp.mean(_elementwise_epe(target_dict["target1"], output_dict["flow1"]))
        return ld


class MultiScaleEPE_FlowNet_IRR_Bi(_LossBase):
    """(losses.py:120-155)."""

    def __call__(self, output_dict, target_dict, training=False):
        ld = {}
        if training:
            target_f = self._div_flow * target_dict["target1"]
            target_b = self._div_flow * target_dict["target2"]
            total = 0.0
            for i, key in enumerate(["flow2", "flow3", "flow4", "flow5", "flow6"]):
                outs = output_dict[key]
                t_f = downsample2d_as(target_f, outs[0][0])
                t_b = downsample2d_as(target_b, outs[0][1])
                for out in outs:
                    epe_f = _elementwise_epe(out[0], t_f)
                    epe_b = _elementwise_epe(out[1], t_b)
                    total = total + _FLOWNET_WEIGHTS[i] * (jnp.sum(epe_f) + jnp.sum(epe_b))
                    ld[f"epe{i + 2}"] = (jnp.mean(epe_f) + jnp.mean(epe_b)) / 2
            ld["total_loss"] = total / self._batch_size / self._num_iters / 2
        else:
            ld["epe"] = jnp.mean(_elementwise_epe(output_dict["flow1"], target_dict["target1"]))
        return ld


class MultiScaleEPE_FlowNet_IRR_Occ(_LossBase):
    """+ occ balanced-F1 + auto balancing (losses.py:157-211)."""

    def __call__(self, output_dict, target_dict, training=False):
        ld = {}
        if training:
            target = self._div_flow * target_dict["target1"]
            target_occ = target_dict["target_occ1"]
            flow_loss = 0.0
            occ_loss = 0.0
            for i, key in enumerate(["flow2", "flow3", "flow4", "flow5", "flow6"]):
                outs = output_dict[key]
                t = downsample2d_as(target, outs[0])
                for out in outs:
                    flow_loss = flow_loss + _FLOWNET_WEIGHTS[i] * jnp.sum(_elementwise_epe(out, t))
            for i, key in enumerate(["occ2", "occ3", "occ4", "occ5", "occ6"]):
                outs = output_dict[key]
                t = downsample2d_as(target_occ, outs[0])
                for out in outs:
                    occ_loss = occ_loss + _FLOWNET_WEIGHTS[i] * f1_score_bal_loss(
                        jax.nn.sigmoid(out), t)
            denom = self._batch_size * self._num_iters
            ld["flow_loss"] = flow_loss / denom
            ld["occ_loss"] = occ_loss / denom
            ld["total_loss"] = _balance(flow_loss, occ_loss) / denom
        else:
            ld["epe"] = jnp.mean(_elementwise_epe(output_dict["flow1"], target_dict["target1"]))
            ld["F1"] = f1_score(target_dict["target_occ1"],
                                jnp.round(jax.nn.sigmoid(output_dict["occ1"])))
        return ld


class MultiScaleEPE_FlowNet_IRR_Bi_Occ(_LossBase):
    """(losses.py:213-276)."""

    def __call__(self, output_dict, target_dict, training=False):
        ld = {}
        if training:
            target_f = self._div_flow * target_dict["target1"]
            target_b = self._div_flow * target_dict["target2"]
            t_occ_f = target_dict["target_occ1"]
            t_occ_b = target_dict["target_occ2"]
            flow_loss = 0.0
            occ_loss = 0.0
            for i, key in enumerate(["flow2", "flow3", "flow4", "flow5", "flow6"]):
                outs = output_dict[key]
                tf_ = downsample2d_as(target_f, outs[0][0])
                tb_ = downsample2d_as(target_b, outs[0][1])
                for out in outs:
                    flow_loss = flow_loss + _FLOWNET_WEIGHTS[i] * (
                        jnp.sum(_elementwise_epe(out[0], tf_))
                        + jnp.sum(_elementwise_epe(out[1], tb_))) * 0.5
            for i, key in enumerate(["occ2", "occ3", "occ4", "occ5", "occ6"]):
                outs = output_dict[key]
                # NOTE: the reference re-downsamples from the previous level's
                # (already downsampled) occ target (losses.py:250-252) —
                # mirrored by rebinding here.
                t_occ_f = downsample2d_as(t_occ_f, outs[0][0])
                t_occ_b = downsample2d_as(t_occ_b, outs[0][1])
                for out in outs:
                    occ_loss = occ_loss + _FLOWNET_WEIGHTS[i] * (
                        f1_score_bal_loss(jax.nn.sigmoid(out[0]), t_occ_f)
                        + f1_score_bal_loss(jax.nn.sigmoid(out[1]), t_occ_b)) * 0.5
            denom = self._batch_size * self._num_iters
            ld["flow_loss"] = flow_loss / denom
            ld["occ_loss"] = occ_loss / denom
            ld["total_loss"] = _balance(flow_loss, occ_loss) / denom
        else:
            ld["epe"] = jnp.mean(_elementwise_epe(output_dict["flow1"], target_dict["target1"]))
            ld["F1"] = f1_score(target_dict["target_occ1"],
                                jnp.round(jax.nn.sigmoid(output_dict["occ1"])))
        return ld


class MultiScaleEPE_FlowNet_IRR_Bi_Occ_upsample(_LossBase):
    """IRR_FlowNet: 7 scales incl. refined full-res (losses.py:278-340)."""

    def __call__(self, output_dict, target_dict, training=False):
        ld = {}
        if training:
            flow_keys = ["flow", "flow1", "flow2", "flow3", "flow4", "flow5", "flow6"]
            occ_keys = ["occ", "occ1", "occ2", "occ3", "occ4", "occ5", "occ6"]
            target_f = self._div_flow * target_dict["target1"]
            target_b = self._div_flow * target_dict["target2"]
            t_occ_f = target_dict["target_occ1"]
            t_occ_b = target_dict["target_occ2"]
            num_iters = len(output_dict["flow"])
            flow_loss = 0.0
            occ_loss = 0.0
            for i, key in enumerate(flow_keys):
                outs = output_dict[key]
                tf_ = downsample2d_as(target_f, outs[0][0])
                tb_ = downsample2d_as(target_b, outs[0][1])
                for out in outs:
                    flow_loss = flow_loss + _FLOWNET_UP_WEIGHTS[i] * (
                        jnp.sum(_elementwise_epe(out[0], tf_))
                        + jnp.sum(_elementwise_epe(out[1], tb_))) * 0.5
            for i, key in enumerate(occ_keys):
                outs = output_dict[key]
                t_occ_f = downsample2d_as(t_occ_f, outs[0][0])
                t_occ_b = downsample2d_as(t_occ_b, outs[0][1])
                for out in outs:
                    occ_loss = occ_loss + _FLOWNET_UP_WEIGHTS[i] * (
                        f1_score_bal_loss(jax.nn.sigmoid(out[0]), t_occ_f)
                        + f1_score_bal_loss(jax.nn.sigmoid(out[1]), t_occ_b)) * 0.5
            denom = self._batch_size * num_iters
            ld["flow_loss"] = flow_loss / denom
            ld["occ_loss"] = occ_loss / denom
            ld["total_loss"] = _balance(flow_loss, occ_loss) / denom
        else:
            ld["epe"] = jnp.mean(_elementwise_epe(output_dict["flow"], target_dict["target1"]))
            ld["F1"] = f1_score(target_dict["target_occ1"],
                                jnp.round(jax.nn.sigmoid(output_dict["occ"])))
        return ld


class MultiScaleEPE_PWC(_LossBase):
    """PWCNet (losses.py:344-372)."""

    def __call__(self, output_dict, target_dict, training=False):
        ld = {}
        if training:
            target = self._div_flow * target_dict["target1"]
            total = 0.0
            for i, out in enumerate(output_dict["flow"]):
                total = total + _PWC_WEIGHTS[i] * jnp.sum(
                    _elementwise_epe(out, downsample2d_as(target, out)))
            ld["total_loss"] = total / self._batch_size
        else:
            ld["epe"] = jnp.mean(_elementwise_epe(output_dict["flow"], target_dict["target1"]))
        return ld


class MultiScaleEPE_PWC_Bi(_LossBase):
    """(losses.py:374-403)."""

    def __call__(self, output_dict, target_dict, training=False):
        ld = {}
        if training:
            target_f = self._div_flow * target_dict["target1"]
            target_b = self._div_flow * target_dict["target2"]
            total = 0.0
            for i, out in enumerate(output_dict["flow"]):
                total = total + _PWC_WEIGHTS[i] * (
                    jnp.sum(_elementwise_epe(out[0], downsample2d_as(target_f, out[0])))
                    + jnp.sum(_elementwise_epe(out[1], downsample2d_as(target_b, out[1]))))
            ld["total_loss"] = total / (2 * self._batch_size)
        else:
            ld["epe"] = jnp.mean(_elementwise_epe(output_dict["flow"], target_dict["target1"]))
        return ld


class MultiScaleEPE_PWC_Occ(_LossBase):
    """(losses.py:405-455)."""

    def __call__(self, output_dict, target_dict, training=False):
        ld = {}
        if training:
            target = self._div_flow * target_dict["target1"]
            target_occ = target_dict["target_occ1"]
            flow_loss = 0.0
            occ_loss = 0.0
            for i, out in enumerate(output_dict["flow"]):
                flow_loss = flow_loss + _PWC_WEIGHTS[i] * jnp.sum(
                    _elementwise_epe(out, downsample2d_as(target, out)))
            for i, out in enumerate(output_dict["occ"]):
                o = jax.nn.sigmoid(out)
                occ_loss = occ_loss + _PWC_WEIGHTS[i] * f1_score_bal_loss(
                    o, downsample2d_as(target_occ, o))
            ld["flow_loss"] = flow_loss / self._batch_size
            ld["occ_loss"] = occ_loss / self._batch_size
            ld["total_loss"] = _balance(flow_loss, occ_loss) / self._batch_size
        else:
            ld["epe"] = jnp.mean(_elementwise_epe(output_dict["flow"], target_dict["target1"]))
            ld["F1"] = f1_score(target_dict["target_occ1"],
                                jnp.round(jax.nn.sigmoid(output_dict["occ"])))
        return ld


class MultiScaleEPE_PWC_Bi_Occ(_LossBase):
    """(losses.py:457-513)."""

    def __call__(self, output_dict, target_dict, training=False):
        ld = {}
        if training:
            target_f = self._div_flow * target_dict["target1"]
            target_b = self._div_flow * target_dict["target2"]
            t_occ_f = target_dict["target_occ1"]
            t_occ_b = target_dict["target_occ2"]
            flow_loss = 0.0
            occ_loss = 0.0
            for i, out in enumerate(output_dict["flow"]):
                flow_loss = flow_loss + _PWC_WEIGHTS[i] * jnp.sum(
                    _elementwise_epe(out[0], downsample2d_as(target_f, out[0])))
                flow_loss = flow_loss + _PWC_WEIGHTS[i] * jnp.sum(
                    _elementwise_epe(out[1], downsample2d_as(target_b, out[1])))
            for i, out in enumerate(output_dict["occ"]):
                of = jax.nn.sigmoid(out[0])
                ob = jax.nn.sigmoid(out[1])
                occ_loss = occ_loss + _PWC_WEIGHTS[i] * f1_score_bal_loss(
                    of, downsample2d_as(t_occ_f, of))
                occ_loss = occ_loss + _PWC_WEIGHTS[i] * f1_score_bal_loss(
                    ob, downsample2d_as(t_occ_b, ob))
            ld["flow_loss"] = flow_loss / (2 * self._batch_size)
            ld["occ_loss"] = occ_loss / (2 * self._batch_size)
            ld["total_loss"] = _balance(flow_loss, occ_loss) / (2 * self._batch_size)
        else:
            ld["epe"] = jnp.mean(_elementwise_epe(output_dict["flow"], target_dict["target1"]))
            ld["F1"] = f1_score(target_dict["target_occ1"],
                                jnp.round(jax.nn.sigmoid(output_dict["occ"])))
        return ld


class MultiScaleEPE_PWC_Bi_Occ_upsample(_LossBase):
    """IRR_PWC: 7 weights, flattened [cont_f, cont_b, ref_f, ref_b] pairs
    (losses.py:515-577)."""

    def __call__(self, output_dict, target_dict, training=False):
        ld = {}
        if training:
            target_f = self._div_flow * target_dict["target1"]
            target_b = self._div_flow * target_dict["target2"]
            t_occ_f = target_dict["target_occ1"]
            t_occ_b = target_dict["target_occ2"]
            flow_loss = 0.0
            occ_loss = 0.0
            for i, outs in enumerate(output_dict["flow"]):
                loss_i = 0.0
                for j in range(len(outs) // 2):
                    loss_i = loss_i + jnp.sum(_elementwise_epe(
                        outs[2 * j], downsample2d_as(target_f, outs[2 * j])))
                    loss_i = loss_i + jnp.sum(_elementwise_epe(
                        outs[2 * j + 1], downsample2d_as(target_b, outs[2 * j + 1])))
                flow_loss = flow_loss + _PWC_UP_WEIGHTS[i] * loss_i / len(outs)
            for i, outs in enumerate(output_dict["occ"]):
                loss_i = 0.0
                for j in range(len(outs) // 2):
                    of = jax.nn.sigmoid(outs[2 * j])
                    ob = jax.nn.sigmoid(outs[2 * j + 1])
                    loss_i = loss_i + f1_score_bal_loss(of, downsample2d_as(t_occ_f, of))
                    loss_i = loss_i + f1_score_bal_loss(ob, downsample2d_as(t_occ_b, ob))
                occ_loss = occ_loss + _PWC_UP_WEIGHTS[i] * loss_i / len(outs)
            ld["flow_loss"] = flow_loss / self._batch_size
            ld["occ_loss"] = occ_loss / self._batch_size
            ld["total_loss"] = _balance(flow_loss, occ_loss) / self._batch_size
        else:
            ld["epe"] = jnp.mean(_elementwise_epe(output_dict["flow"], target_dict["target1"]))
            ld["F1"] = f1_score(target_dict["target_occ1"],
                                jnp.round(jax.nn.sigmoid(output_dict["occ"])))
        return ld


class MultiScaleEPE_PWC_Bi_Occ_upsample_Sintel(_LossBase):
    """Sintel fine-tune: robust EPE, forward-only, plain BCE for occ
    (losses.py:579-638)."""

    def __call__(self, output_dict, target_dict, training=False):
        ld = {}
        if training:
            target_f = self._div_flow * target_dict["target1"]
            t_occ_f = target_dict["target_occ1"]
            flow_loss = 0.0
            occ_loss = 0.0
            for i, outs in enumerate(output_dict["flow"]):
                loss_i = 0.0
                for j in range(len(outs) // 2):
                    loss_i = loss_i + jnp.sum(_elementwise_robust_epe_char(
                        outs[2 * j], downsample2d_as(target_f, outs[2 * j])))
                flow_loss = flow_loss + _PWC_UP_WEIGHTS[i] * loss_i / len(outs) * 2
            for i, outs in enumerate(output_dict["occ"]):
                loss_i = 0.0
                for j in range(len(outs) // 2):
                    of = jax.nn.sigmoid(outs[2 * j])
                    loss_i = loss_i + _bce_sum(of, downsample2d_as(t_occ_f, of))
                occ_loss = occ_loss + _PWC_UP_WEIGHTS[i] * loss_i / len(outs) * 2
            ld["flow_loss"] = flow_loss / self._batch_size
            ld["occ_loss"] = occ_loss / self._batch_size
            ld["total_loss"] = _balance(flow_loss, occ_loss) / self._batch_size
        else:
            ld["epe"] = jnp.mean(_elementwise_epe(output_dict["flow"], target_dict["target1"]))
            ld["F1"] = f1_score(target_dict["target_occ1"],
                                jnp.round(jax.nn.sigmoid(output_dict["occ"])))
        return ld


class MultiScaleEPE_PWC_Bi_Occ_upsample_KITTI(_LossBase):
    """KITTI fine-tune: sparse valid-masked robust EPE upsampled to GT res,
    per-image renormalization; occ heads unused (losses.py:640-699)."""

    def __call__(self, output_dict, target_dict, training=False):
        ld = {}
        valid = target_dict["input_valid"]  # (B, H, W, 1)
        b, h, w, _ = target_dict["target1"].shape
        if training:
            target_f = self._div_flow * target_dict["target1"]
            flow_loss = 0.0
            for i, outs in enumerate(output_dict["flow"]):
                loss_i = 0.0
                for j in range(len(outs) // 2):
                    up = upsample2d_as(outs[2 * j], target_f)
                    valid_epe = _elementwise_robust_epe_char(up, target_f) * valid
                    per_image = jnp.sum(valid_epe, axis=(1, 2, 3))
                    norm_const = (h * w) / jnp.sum(valid, axis=(1, 2, 3))
                    loss_i = loss_i + jnp.sum(per_image * norm_const)
                flow_loss = flow_loss + _KITTI_WEIGHTS[i] * loss_i / len(outs) * 2
            ld["flow_loss"] = flow_loss / self._batch_size
            ld["total_loss"] = flow_loss / self._batch_size
        else:
            gt_mag = safe_norm(target_dict["target1"], axis=-1, keepdims=True) + 1e-8
            epe = _elementwise_epe(output_dict["flow"], target_dict["target1"]) * valid
            valid_sum = jnp.sum(valid.reshape(b, -1), axis=1)
            ld["epe"] = jnp.mean(jnp.sum(epe.reshape(b, -1), axis=1) / valid_sum)
            outlier = ((epe > 3).astype(jnp.float32)
                       * ((epe / gt_mag) > 0.05).astype(jnp.float32) * valid)
            ld["outlier"] = jnp.mean(jnp.sum(outlier.reshape(b, -1), axis=1) / valid_sum)
        return ld
