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


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC width-sharded: (B, H, W/devices, C) per device."""
    axis = mesh.axis_names[0]
    return NamedSharding(mesh, P(None, None, axis, None))


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
