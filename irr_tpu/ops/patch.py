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
    """Apply a shared per-pixel 3x3 kernel to every channel of x.

    x: (B, H, W, C); kernel: (B, H, W, 9) -> (B, H, W, C). The kernel is
    broadcast over channels (the reference applies one predicted kernel
    to flow-x and flow-y separately, irr_modules.py:96-99 — same math,
    one pass). Accumulates shift-by-shift instead of materializing the
    unfold9 stack: a (B,H,W)-per-shift stack on the last axis creates
    single-lane tensors that TPU layouts tile-pad 128x (see
    cost_volume_xla's docstring for the same issue).
    """
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    acc = None
    k = 0
    for ky in range(3):
        for kx in range(3):
            t = xp[:, ky:ky + h, kx:kx + w, :] * kernel[..., k:k + 1]
            acc = t if acc is None else acc + t
            k += 1
    return acc
