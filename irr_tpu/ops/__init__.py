"""Core tensor ops: cost volume, warping, resizing, interpolation.

All ops use NHWC layout (TPU conv-native). Semantics mirror the reference
PyTorch ops bit-for-bit where checkpoint parity depends on it (see
docstrings for reference file:line citations).
"""

from .cost_volume import cost_volume, cost_volume_xla, cost_volume_pallas
from .warp import grid_sample_aligned, warp_masked, warp_unmasked, warp_multi, inbounds_mask
from .resize import (
    upsample2d,
    upsample2d_as,
    adaptive_avg_pool,
    downsample2d_as,
    resize2d,
    resize2d_as,
    upsample_factor2,
    rescale_flow,
)
from .interp import interp2, interp2_mask_binary
from .patch import unfold9, local_filter_3x3
