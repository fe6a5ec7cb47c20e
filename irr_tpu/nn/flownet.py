"""FlowNetS encoder/decoder blocks (reference models/flownet_modules.py,
models/flownet1s.py:10-93, models/IRR_FlowNet.py:11-127)."""

import jax
import jax.numpy as jnp

from .core import Module, Conv, ConvTranspose
from ..ops.resize import resize2d_as


def concatenate_as(tensors, target):
    """Resize each tensor to target's spatial dims, concat on channels
    (flownet_modules.py:52-54)."""
    return jnp.concatenate([resize2d_as(t, target) for t in tensors], axis=-1)


def _conv(cin, cout, k, stride):
    return Conv(cin, cout, kernel_size=k, stride=stride, pad=k // 2, relu=True)


def _predict(cin, cout=2):
    return Conv(cin, cout, kernel_size=3, stride=1, pad=1, relu=False)


def _deconv(cin, cout):
    return ConvTranspose(cin, cout, kernel_size=4, stride=2, pad=1, relu=True, bias=False)


def _upsample(cin, cout):
    return ConvTranspose(cin, cout, kernel_size=4, stride=2, pad=1, relu=False, bias=False)


class _Struct(Module):
    """Module with a dict of named submodules defined by subclasses."""

    def _submodules(self):
        return {n: m for n, m in vars(self).items() if isinstance(m, Module)}

    def init(self, key):
        return {n: m.init(jax.random.fold_in(key, i))
                for i, (n, m) in enumerate(sorted(self._submodules().items()))}


class FlowNetS(_Struct):
    """Vanilla FlowNetS (flownet1s.py:10-93): 10-conv encoder over the
    6-channel image pair, 4 deconvs, 5 predict heads, learned flow upsamplers.
    Returns flow2..flow6 (coarse head last)."""

    def __init__(self):
        self.conv1 = _conv(6, 64, 7, 2)
        self.conv2 = _conv(64, 128, 5, 2)
        self.conv3 = _conv(128, 256, 5, 2)
        self.conv3_1 = _conv(256, 256, 3, 1)
        self.conv4 = _conv(256, 512, 3, 2)
        self.conv4_1 = _conv(512, 512, 3, 1)
        self.conv5 = _conv(512, 512, 3, 2)
        self.conv5_1 = _conv(512, 512, 3, 1)
        self.conv6 = _conv(512, 1024, 3, 2)
        self.conv6_1 = _conv(1024, 1024, 3, 1)

        self.deconv5 = _deconv(1024, 512)
        self.deconv4 = _deconv(1024 + 2, 256)
        self.deconv3 = _deconv(768 + 2, 128)
        self.deconv2 = _deconv(384 + 2, 64)

        self.predict_flow6 = _predict(1024)
        self.predict_flow5 = _predict(1024 + 2)
        self.predict_flow4 = _predict(768 + 2)
        self.predict_flow3 = _predict(384 + 2)
        self.predict_flow2 = _predict(192 + 2)

        self.upsample_flow6_to_5 = _upsample(2, 2)
        self.upsample_flow5_to_4 = _upsample(2, 2)
        self.upsample_flow4_to_3 = _upsample(2, 2)
        self.upsample_flow3_to_2 = _upsample(2, 2)

    def __call__(self, p, x):
        conv1 = self.conv1(p["conv1"], x)
        conv2 = self.conv2(p["conv2"], conv1)
        conv3_1 = self.conv3_1(p["conv3_1"], self.conv3(p["conv3"], conv2))
        conv4_1 = self.conv4_1(p["conv4_1"], self.conv4(p["conv4"], conv3_1))
        conv5_1 = self.conv5_1(p["conv5_1"], self.conv5(p["conv5"], conv4_1))
        conv6_1 = self.conv6_1(p["conv6_1"], self.conv6(p["conv6"], conv5_1))

        flow6 = self.predict_flow6(p["predict_flow6"], conv6_1)

        up6 = self.upsample_flow6_to_5(p["upsample_flow6_to_5"], flow6)
        de5 = self.deconv5(p["deconv5"], conv6_1)
        cat5 = concatenate_as((conv5_1, de5, up6), conv5_1)
        flow5 = self.predict_flow5(p["predict_flow5"], cat5)

        up5 = self.upsample_flow5_to_4(p["upsample_flow5_to_4"], flow5)
        de4 = self.deconv4(p["deconv4"], cat5)
        cat4 = concatenate_as((conv4_1, de4, up5), conv4_1)
        flow4 = self.predict_flow4(p["predict_flow4"], cat4)

        up4 = self.upsample_flow4_to_3(p["upsample_flow4_to_3"], flow4)
        de3 = self.deconv3(p["deconv3"], cat4)
        cat3 = concatenate_as((conv3_1, de3, up4), conv3_1)
        flow3 = self.predict_flow3(p["predict_flow3"], cat3)

        up3 = self.upsample_flow3_to_2(p["upsample_flow3_to_2"], flow3)
        de2 = self.deconv2(p["deconv2"], cat3)
        cat2 = concatenate_as((conv2, de2, up3), conv2)
        flow2 = self.predict_flow2(p["predict_flow2"], cat2)

        return flow2, flow3, flow4, flow5, flow6


class FlowNetSIrr(_Struct):
    """Shared FlowNetS decoder operating on pre-extracted conv3 features,
    iterated by the IRR FlowNet variants. All irr variants use the 3-conv
    stem (3->32->64->128) whose conv2 is 64ch, so concat2 = 64+64+2 = 128+2
    (flownet1s_irr.py:44, IRR_FlowNet.py:50).

    With `occ=True` adds the parallel occlusion decoder
    (IRR_FlowNet.py:37-70,104-127)."""

    def __init__(self, predict2_ch=128 + 2, occ=False, occ_predict2_ch=128 + 1):
        self.occ = occ
        self.conv3_1 = _conv(256, 256, 3, 1)
        self.conv4 = _conv(256, 512, 3, 2)
        self.conv4_1 = _conv(512, 512, 3, 1)
        self.conv5 = _conv(512, 512, 3, 2)
        self.conv5_1 = _conv(512, 512, 3, 1)
        self.conv6 = _conv(512, 1024, 3, 2)
        self.conv6_1 = _conv(1024, 1024, 3, 1)

        self.deconv5 = _deconv(1024, 512)
        self.deconv4 = _deconv(1024 + 2, 256)
        self.deconv3 = _deconv(768 + 2, 128)
        self.deconv2 = _deconv(384 + 2, 64)

        self.predict_flow6 = _predict(1024)
        self.predict_flow5 = _predict(1024 + 2)
        self.predict_flow4 = _predict(768 + 2)
        self.predict_flow3 = _predict(384 + 2)
        self.predict_flow2 = _predict(predict2_ch)

        self.upsample_flow6_to_5 = _upsample(2, 2)
        self.upsample_flow5_to_4 = _upsample(2, 2)
        self.upsample_flow4_to_3 = _upsample(2, 2)
        self.upsample_flow3_to_2 = _upsample(2, 2)

        if occ:
            self.deconv_occ5 = _deconv(1024, 512)
            self.deconv_occ4 = _deconv(1024 + 1, 256)
            self.deconv_occ3 = _deconv(768 + 1, 128)
            self.deconv_occ2 = _deconv(384 + 1, 64)

            self.predict_occ6 = _predict(1024, 1)
            self.predict_occ5 = _predict(1024 + 1, 1)
            self.predict_occ4 = _predict(768 + 1, 1)
            self.predict_occ3 = _predict(384 + 1, 1)
            self.predict_occ2 = _predict(occ_predict2_ch, 1)

            self.upsample_occ6_to_5 = _upsample(1, 1)
            self.upsample_occ5_to_4 = _upsample(1, 1)
            self.upsample_occ4_to_3 = _upsample(1, 1)
            self.upsample_occ3_to_2 = _upsample(1, 1)

    def __call__(self, p, conv2_im1, conv3_im1, conv3_im2):
        cat3 = jnp.concatenate([conv3_im1, conv3_im2], axis=-1)
        conv3_1 = self.conv3_1(p["conv3_1"], cat3)
        conv4_1 = self.conv4_1(p["conv4_1"], self.conv4(p["conv4"], conv3_1))
        conv5_1 = self.conv5_1(p["conv5_1"], self.conv5(p["conv5"], conv4_1))
        conv6_1 = self.conv6_1(p["conv6_1"], self.conv6(p["conv6"], conv5_1))

        flow6 = self.predict_flow6(p["predict_flow6"], conv6_1)
        up6 = self.upsample_flow6_to_5(p["upsample_flow6_to_5"], flow6)
        de5 = self.deconv5(p["deconv5"], conv6_1)
        cat5 = concatenate_as((conv5_1, de5, up6), conv5_1)
        flow5 = self.predict_flow5(p["predict_flow5"], cat5)

        up5 = self.upsample_flow5_to_4(p["upsample_flow5_to_4"], flow5)
        de4 = self.deconv4(p["deconv4"], cat5)
        cat4 = concatenate_as((conv4_1, de4, up5), conv4_1)
        flow4 = self.predict_flow4(p["predict_flow4"], cat4)

        up4 = self.upsample_flow4_to_3(p["upsample_flow4_to_3"], flow4)
        de3 = self.deconv3(p["deconv3"], cat4)
        cat3d = concatenate_as((conv3_1, de3, up4), conv3_1)
        flow3 = self.predict_flow3(p["predict_flow3"], cat3d)

        up3 = self.upsample_flow3_to_2(p["upsample_flow3_to_2"], flow3)
        de2 = self.deconv2(p["deconv2"], cat3d)
        cat2 = concatenate_as((conv2_im1, de2, up3), conv2_im1)
        flow2 = self.predict_flow2(p["predict_flow2"], cat2)

        flows = (flow2, flow3, flow4, flow5, flow6)
        if not self.occ:
            return flows

        occ6 = self.predict_occ6(p["predict_occ6"], conv6_1)
        upo6 = self.upsample_occ6_to_5(p["upsample_occ6_to_5"], occ6)
        deo5 = self.deconv_occ5(p["deconv_occ5"], conv6_1)
        cato5 = concatenate_as((conv5_1, deo5, upo6), conv5_1)
        occ5 = self.predict_occ5(p["predict_occ5"], cato5)

        upo5 = self.upsample_occ5_to_4(p["upsample_occ5_to_4"], occ5)
        deo4 = self.deconv_occ4(p["deconv_occ4"], cato5)
        cato4 = concatenate_as((conv4_1, deo4, upo5), conv4_1)
        occ4 = self.predict_occ4(p["predict_occ4"], cato4)

        upo4 = self.upsample_occ4_to_3(p["upsample_occ4_to_3"], occ4)
        deo3 = self.deconv_occ3(p["deconv_occ3"], cato4)
        cato3 = concatenate_as((conv3_1, deo3, upo4), conv3_1)
        occ3 = self.predict_occ3(p["predict_occ3"], cato3)

        upo3 = self.upsample_occ3_to_2(p["upsample_occ3_to_2"], occ3)
        deo2 = self.deconv_occ2(p["deconv_occ2"], cato3)
        cato2 = concatenate_as((conv2_im1, deo2, upo3), conv2_im1)
        occ2 = self.predict_occ2(p["predict_occ2"], cato2)

        return flows + (occ2, occ3, occ4, occ5, occ6)
