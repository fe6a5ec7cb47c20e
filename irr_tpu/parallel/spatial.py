"""Spatial sharding for high-resolution inference (SURVEY.md §5 stretch).

The reference has no distributed runtime at all; the TPU-native analog of
"scaling the big dimension" here is spatial: shard the image WIDTH of a
single (or small-batch) high-res pair across the mesh and let GSPMD insert
the halo exchanges for the stride-2 convs, the ±4px cost-volume window and
the warping gathers automatically. Verified equal to the unsharded forward
to ~1e-5 in tests (reduction-order noise only).
"""

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh
from ..nn.core import normalize_image_batch


def make_mesh2d(n_data, n_width, devices=None) -> Mesh:
    """2-D (data, width) mesh: batch parallelism x spatial sharding.

    The pod-scale eval layout: a (D, S) mesh runs D batch shards, each
    width-sharded over S chips. On real hardware lay the width axis on
    the faster ICI dimension (halo exchanges are latency-bound; the batch
    axis has no per-layer communication at eval)."""
    import numpy as np
    if devices is None:
        devices = jax.devices()
    n = n_data * n_width
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(n_data, n_width),
                ("data", "width"))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC width-sharded: (B, H, W/devices, C) per device. On a 2-D
    (data, width) mesh the batch axis shards too."""
    if len(mesh.axis_names) == 2:
        return NamedSharding(mesh, P(mesh.axis_names[0], None,
                                     mesh.axis_names[1], None))
    return NamedSharding(mesh, P(None, None, mesh.axis_names[0], None))


def make_spatial_eval(model, mesh: Mesh = None):
    """Jitted eval forward with width-sharded inputs and replicated params.

    Returns (fn, shard_inputs) where fn(params, input_dict) -> output_dict
    and shard_inputs places an input dict onto the mesh.
    """
    if mesh is None:
        mesh = make_mesh()
    ws = spatial_sharding(mesh)
    rep = NamedSharding(mesh, P())

    fn = jax.jit(
        lambda p, i: model.apply(p, normalize_image_batch(i), training=False),
        in_shardings=(rep, ws), out_shardings=rep)

    def shard_inputs(input_dict):
        return {k: jax.device_put(v, ws) for k, v in input_dict.items()}

    def place_params(params):
        return jax.device_put(params, rep)

    return fn, shard_inputs, place_params
