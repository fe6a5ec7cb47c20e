"""3x3 neighborhood extraction and kernel-predicted local filtering.

The reference's RefineFlow/RefineOcc (models/irr_modules.py:63-139) predict a
per-pixel 3x3 kernel (softmax of -feat^2 over 9 channels) and apply it to the
3x3 neighborhood of a 1-channel map extracted with ReplicationPad2d + Unfold.

On TPU we express the unfold as 9 static slices of an edge-padded array —
pure shifts that XLA fuses into the weighted sum; no gather, no im2col
materialization beyond the 9-channel output.

nn.Unfold channel order: row-major over (ky, kx); patch k = (ky*3 + kx) at
output (y, x) reads padded[y + ky, x + kx] = input[y + ky - 1, x + kx - 1]
with edge replication. We keep exactly that order so the predicted-kernel
channels line up with the reference.
"""

import jax.numpy as jnp


def unfold9(x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, W, 1) -> (B, H, W, 9) 3x3 neighborhoods, edge-replicated."""
    b, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    outs = []
    for ky in range(3):
        for kx in range(3):
            outs.append(xp[:, ky:ky + h, kx:kx + w, 0])
    return jnp.stack(outs, axis=-1)


def local_filter_3x3(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Apply per-pixel 3x3 kernel to a single-channel map.

    x: (B, H, W, 1); kernel: (B, H, W, 9) -> (B, H, W, 1).
    """
    patches = unfold9(x)
    return jnp.sum(patches * kernel, axis=-1, keepdims=True)
