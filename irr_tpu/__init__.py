"""irr_tpu — a TPU-native optical-flow framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of visinf/irr
("Iterative Residual Refinement for Joint Optical Flow and Occlusion
Estimation", CVPR 2019): the full IRR-PWC / PWC-Net / FlowNet model zoo,
multi-scale losses, on-device augmentations, dataset pipeline, runtime loop,
checkpointing, and a reflection-based CLI — designed TPU-first (NHWC layout,
jit-compiled train step, SPMD data parallelism over a device mesh, fused
Pallas cost-volume kernel).
"""

__version__ = "0.1.0"
