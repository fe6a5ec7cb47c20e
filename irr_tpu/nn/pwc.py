"""PWC-Net building blocks (reference models/pwc_modules.py:85-243).

All modules are functional: static config, `init(key)` -> params pytree,
`__call__(params, x)` pure. NHWC throughout.
"""

import jax

from .core import Module, Conv, Sequential
import jax.numpy as jnp


class FeatureExtractor(Module):
    """Siamese 6-stage conv pyramid (pwc_modules.py:85-104).

    Each stage: stride-2 conv + stride-1 conv, LeakyReLU(0.1).
    Returns the pyramid coarse -> fine.
    """

    def __init__(self, num_chs):
        self.num_chs = list(num_chs)
        self.stages = [
            Sequential(Conv(cin, cout, stride=2), Conv(cout, cout))
            for cin, cout in zip(self.num_chs[:-1], self.num_chs[1:])
        ]

    def init(self, key):
        return [s.init(jax.random.fold_in(key, i)) for i, s in enumerate(self.stages)]

    def __call__(self, params, x):
        pyramid = []
        for p, stage in zip(params, self.stages):
            x = stage(p, x)
            pyramid.append(x)
        return pyramid[::-1]


class OpticalFlowEstimator(Module):
    """Plain 5-conv estimator + 2ch head (pwc_modules.py:135-150)."""

    def __init__(self, ch_in, ch_out=2):
        self.convs = Sequential(
            Conv(ch_in, 128), Conv(128, 128), Conv(128, 96),
            Conv(96, 64), Conv(64, 32))
        self.conv_last = Conv(32, ch_out, relu=False)

    def init(self, key):
        return {"convs": self.convs.init(jax.random.fold_in(key, 0)),
                "conv_last": self.conv_last.init(jax.random.fold_in(key, 1))}

    def __call__(self, params, x):
        x_intm = self.convs(params["convs"], x)
        return x_intm, self.conv_last(params["conv_last"], x_intm)


class OcclusionEstimator(OpticalFlowEstimator):
    """Same trunk with a 1ch head (pwc_modules.py:173-187)."""

    def __init__(self, ch_in):
        super().__init__(ch_in, ch_out=1)


class FlowEstimatorDense(Module):
    """DenseNet-style decoder (pwc_modules.py:153-170): each conv's output is
    concatenated in front of its input; final 1x1-equivalent head reads the
    full 448-channel accumulation."""

    def __init__(self, ch_in, ch_out=2):
        self.conv1 = Conv(ch_in, 128)
        self.conv2 = Conv(ch_in + 128, 128)
        self.conv3 = Conv(ch_in + 256, 96)
        self.conv4 = Conv(ch_in + 352, 64)
        self.conv5 = Conv(ch_in + 416, 32)
        self.conv_last = Conv(ch_in + 448, ch_out, relu=False)

    def init(self, key):
        names = ["conv1", "conv2", "conv3", "conv4", "conv5", "conv_last"]
        return {n: getattr(self, n).init(jax.random.fold_in(key, i))
                for i, n in enumerate(names)}

    def __call__(self, params, x):
        x1 = jnp.concatenate([self.conv1(params["conv1"], x), x], axis=-1)
        x2 = jnp.concatenate([self.conv2(params["conv2"], x1), x1], axis=-1)
        x3 = jnp.concatenate([self.conv3(params["conv3"], x2), x2], axis=-1)
        x4 = jnp.concatenate([self.conv4(params["conv4"], x3), x3], axis=-1)
        x5 = jnp.concatenate([self.conv5(params["conv5"], x4), x4], axis=-1)
        out = self.conv_last(params["conv_last"], x5)
        return x5, out


class OccEstimatorDense(FlowEstimatorDense):
    def __init__(self, ch_in):
        super().__init__(ch_in, ch_out=1)


class ContextNetwork(Module):
    """7-layer dilated refinement, residual output (pwc_modules.py:210-225)."""

    def __init__(self, ch_in, ch_out=2):
        self.net = Sequential(
            Conv(ch_in, 128, 3, 1, 1),
            Conv(128, 128, 3, 1, 2),
            Conv(128, 128, 3, 1, 4),
            Conv(128, 96, 3, 1, 8),
            Conv(96, 64, 3, 1, 16),
            Conv(64, 32, 3, 1, 1),
            Conv(32, ch_out, relu=False))

    def init(self, key):
        return self.net.init(key)

    def __call__(self, params, x):
        return self.net(params, x)


class OccContextNetwork(ContextNetwork):
    def __init__(self, ch_in):
        super().__init__(ch_in, ch_out=1)
