"""Functional NN building blocks (pure pytree params, NHWC)."""

from .core import (
    Module,
    Conv,
    ConvTranspose,
    Sequential,
    leaky_relu,
    set_compute_dtype,
    compute_dtype,
    param_count,
    param_paths,
)
from .pwc import (
    FeatureExtractor,
    OpticalFlowEstimator,
    OcclusionEstimator,
    FlowEstimatorDense,
    OccEstimatorDense,
    ContextNetwork,
    OccContextNetwork,
)
from .irr import OccUpsampleNetwork, RefineFlow, RefineOcc
