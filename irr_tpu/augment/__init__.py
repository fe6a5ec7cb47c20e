"""On-device geometric augmentations (reference augmentations.py, jitted).

The four classes run batch-wise on device inside the train step pipeline
(reference runtime.py:151-153). Shared machinery (augmentations.py:26-310):
affine params as a 6-vector theta acting on [-1,1]-normalized coords;
rejection-sampled zoom/squeeze/translate/rotate until all four image corners
stay in-bounds; images warped through the INVERSE affine via interp2; flow
re-derived exactly under the pair of affines (inverse-transform the grid
through theta1 and grid+flow through theta2, subtract); random mirroring as
sign flips on theta rows.

TPU-first: the reference's unbounded rejection loop (augmentations.py:252)
becomes a bounded `lax.while_loop` carrying per-sample acceptance masks —
identical distribution, fixed trip-count bound, fully jittable.
"""

import functools

import jax
import jax.numpy as jnp

from ..ops.interp import interp2, interp2_mask_binary

_MAX_REJECTION_ITERS = 64


def _identity_theta(batch_size):
    return jnp.tile(jnp.asarray([1., 0., 0., 0., 1., 0.], jnp.float32), (batch_size, 1))


def apply_transform_to_params(theta0, t):
    """Affine composition in theta form (augmentations.py:26-49)."""
    a1, a2, a3, a4, a5, a6 = [theta0[:, i] for i in range(6)]
    b1, b2, b3, b4, b5, b6 = [t[:, i] for i in range(6)]
    return jnp.stack([
        a1 * b1 + a4 * b2,
        a2 * b1 + a5 * b2,
        b3 + a3 * b1 + a6 * b2,
        a1 * b4 + a4 * b5,
        a2 * b4 + a5 * b5,
        b6 + a3 * b4 + a6 * b5,
    ], axis=1)


def _denormalize(xx, yy, width, height):
    return 0.5 * (width - 1.0) * (xx + 1.0), 0.5 * (height - 1.0) * (yy + 1.0)


def _find_invalid(thetas, height, width):
    """True where any of the 4 corners leaves the image under the inverse
    affine (augmentations.py:202-229). thetas: (B, 6) -> (B, 1) bool."""
    xb = jnp.asarray([-1., -1., 1., 1.])
    yb = jnp.asarray([-1., 1., -1., 1.])
    a = [thetas[:, i:i + 1] for i in range(6)]
    z = a[0] * a[4] - a[1] * a[3]
    b1, b2 = a[4] / z, -a[1] / z
    b4, b5 = -a[3] / z, a[0] / z
    xhat = xb[None, :] - a[2]
    yhat = yb[None, :] - a[5]
    xq = b1 * xhat + b2 * yhat
    yq = b4 * xhat + b5 * yhat
    xq, yq = _denormalize(xq, yq, width, height)
    bad = (xq < 0) | (yq < 0) | (xq >= width) | (yq >= height)
    return jnp.any(bad, axis=1, keepdims=True)


def _sample_thetas(key, theta0, *, max_translate, min_zoom, max_zoom,
                   min_squeeze, max_squeeze, min_rotate, max_rotate,
                   height, width):
    """Rejection-sample per-example affines (augmentations.py:231-280)."""
    max_translate = max_translate * 0.5
    b = theta0.shape[0]

    def draw(key, theta0):
        ks = jax.random.split(key, 5)
        zoom = jax.random.uniform(ks[0], (b, 1), minval=min_zoom, maxval=max_zoom)
        squeeze = jax.random.uniform(ks[1], (b, 1), minval=min_squeeze, maxval=max_squeeze)
        tx = jax.random.uniform(ks[2], (b, 1), minval=-max_translate, maxval=max_translate)
        ty = jax.random.uniform(ks[3], (b, 1), minval=-max_translate, maxval=max_translate)
        phi = jax.random.uniform(ks[4], (b, 1), minval=min_rotate, maxval=max_rotate)
        sx = zoom * squeeze
        sy = zoom / squeeze
        sin_phi = jnp.sin(phi)
        cos_phi = jnp.cos(phi)
        t = jnp.concatenate(
            [cos_phi * sx, sin_phi * sy, tx, -sin_phi * sx, cos_phi * sy, ty], axis=1)
        return apply_transform_to_params(theta0, t)

    def cond(carry):
        i, _, invalid, _ = carry
        return jnp.logical_and(jnp.any(invalid), i < _MAX_REJECTION_ITERS)

    def body(carry):
        i, key, invalid, thetas = carry
        key, sub = jax.random.split(key)
        theta_try = draw(sub, theta0)
        thetas = jnp.where(invalid, theta_try, thetas)
        invalid = _find_invalid(thetas, height, width)
        return i + 1, key, invalid, thetas

    init = (0, key, jnp.ones((b, 1), bool), jnp.zeros_like(theta0))
    _, _, _, thetas = jax.lax.while_loop(cond, body, init)
    return thetas


def _mirror(key, theta1, theta2, vertical=True, p=0.5):
    """Random sign flips of the x (and optionally y) rows
    (augmentations.py:71-103); the same flip applies to both thetas."""
    b = theta1.shape[0]
    k1, k2 = jax.random.split(key)
    sign_x = jnp.sign(2.0 * jax.random.bernoulli(k1, p, (b, 1)).astype(jnp.float32) - 1.0)
    ones = jnp.ones_like(sign_x)
    hm = jnp.concatenate([sign_x, sign_x, sign_x, ones, ones, ones], axis=1)
    theta1 = theta1 * hm
    theta2 = theta2 * hm
    if vertical:
        sign_y = jnp.sign(2.0 * jax.random.bernoulli(k2, p, (b, 1)).astype(jnp.float32) - 1.0)
        vm = jnp.concatenate([ones, ones, ones, sign_y, sign_y, sign_y], axis=1)
        theta1 = theta1 * vm
        theta2 = theta2 * vm
    return theta1, theta2


def _grid(height, width):
    xx = jnp.arange(width, dtype=jnp.float32)[None, None, :]
    yy = jnp.arange(height, dtype=jnp.float32)[None, :, None]
    return (jnp.broadcast_to(xx, (1, height, width)),
            jnp.broadcast_to(yy, (1, height, width)))


def _normalize(xx, yy, width, height):
    return (2.0 / (width - 1.0)) * xx - 1.0, (2.0 / (height - 1.0)) * yy - 1.0


def inverse_transform_coords(thetas, height, width, offset_x=None, offset_y=None):
    """Map grid (+ optional flow offset) through theta (augmentations.py:150-172)."""
    xx, yy = _grid(height, width)
    if offset_x is not None:
        xx = xx + offset_x
    if offset_y is not None:
        yy = yy + offset_y
    a = [thetas[:, i].reshape(-1, 1, 1) for i in range(6)]
    xx, yy = _normalize(xx, yy, width, height)
    xq = a[0] * xx + a[1] * yy + a[2]
    yq = a[3] * xx + a[4] * yy + a[5]
    return _denormalize(xq, yq, width, height)


def transform_coords(thetas, height, width):
    """Sampling coords through the INVERSE affine (augmentations.py:174-200)."""
    xx, yy = _grid(height, width)
    xx, yy = _normalize(xx, yy, width, height)
    a = [thetas[:, i].reshape(-1, 1, 1) for i in range(6)]
    z = a[0] * a[4] - a[1] * a[3]
    b1, b2 = a[4] / z, -a[1] / z
    b4, b5 = -a[3] / z, a[0] / z
    xhat = xx - a[2]
    yhat = yy - a[5]
    xq = b1 * xhat + b2 * yhat
    yq = b4 * xhat + b5 * yhat
    return _denormalize(xq, yq, width, height)


def transform_image(images, thetas):
    """images: (B, H, W, C)."""
    h, w = images.shape[1], images.shape[2]
    xq, yq = transform_coords(thetas, h, w)
    return interp2(images, xq, yq)


def transform_flow(flow, theta1, theta2):
    """Exact flow re-derivation under the affine pair
    (augmentations.py:288-310). flow: (B, H, W, 2)."""
    h, w = flow.shape[1], flow.shape[2]
    u = flow[..., 0]
    v = flow[..., 1]
    x0, y0 = inverse_transform_coords(theta1, h, w)
    x1, y1 = inverse_transform_coords(theta2, h, w, offset_x=u, offset_y=v)
    new_flow = jnp.stack([x1 - x0, y1 - y0], axis=-1)
    xq, yq = transform_coords(theta1, h, w)
    return interp2(new_flow, xq, yq)


def transform_flow_masked(flow, theta1, theta2, valid_mask):
    """KITTI variant: mask-weighted interp carrying validity
    (augmentations.py:1092-1115)."""
    h, w = flow.shape[1], flow.shape[2]
    u = flow[..., 0]
    v = flow[..., 1]
    x0, y0 = inverse_transform_coords(theta1, h, w)
    x1, y1 = inverse_transform_coords(theta2, h, w, offset_x=u, offset_y=v)
    new_flow = jnp.stack([x1 - x0, y1 - y0], axis=-1)
    xq, yq = transform_coords(theta1, h, w)
    return interp2_mask_binary(new_flow, xq, yq, valid_mask)


def check_out_of_bound(flow, occ):
    """OR out-of-bounds pixels into the occlusion map
    (augmentations.py:549-562)."""
    h, w = flow.shape[1], flow.shape[2]
    xx, yy = _grid(h, w)
    xx = xx + flow[..., 0]
    yy = yy + flow[..., 1]
    oob = ((xx < 0) | (yy < 0) | (xx >= w) | (yy >= h))[..., None].astype(occ.dtype)
    return jnp.clip(oob + occ, 0.0, 1.0)


def _random_crop(key, tensors, crop):
    """One random crop applied to the whole batch (augmentations.py:564-584)."""
    ch, cw = crop
    h, w = tensors[0].shape[1], tensors[0].shape[2]
    kx, ky = jax.random.split(key)
    x = jax.random.randint(kx, (), 0, w - cw + 1)
    y = jax.random.randint(ky, (), 0, h - ch + 1)
    out = []
    for t in tensors:
        out.append(jax.lax.dynamic_slice(
            t, (0, y, x, 0), (t.shape[0], ch, cw, t.shape[3])))
    return out


def _add_noise(key, im1, im2):
    """Gaussian noise with a per-batch stddev ~ U[0, 0.04]
    (augmentations.py:349-358)."""
    ks = jax.random.split(key, 3)
    stddev = jax.random.uniform(ks[0], (), minval=0.0, maxval=0.04)
    im1 = jnp.clip(im1 + jax.random.normal(ks[1], im1.shape) * stddev, 0.0, 1.0)
    im2 = jnp.clip(im2 + jax.random.normal(ks[2], im2.shape) * stddev, 0.0, 1.0)
    return im1, im2


_GLOBAL_RANGES = dict(max_translate=0.2, min_zoom=1.0, max_zoom=1.5,
                      min_squeeze=0.86, max_squeeze=1.16,
                      min_rotate=-0.2, max_rotate=0.2)
_RELATIVE_RANGES = dict(max_translate=0.015, min_zoom=0.985, max_zoom=1.015,
                        min_squeeze=1.0, max_squeeze=1.0,
                        min_rotate=-0.015, max_rotate=0.015)
_KITTI_GLOBAL = dict(max_translate=0.04, min_zoom=0.98, max_zoom=1.02,
                     min_squeeze=1.0, max_squeeze=1.0,
                     min_rotate=-0.01, max_rotate=0.01)
_KITTI_RELATIVE = dict(max_translate=0.005, min_zoom=0.99, max_zoom=1.01,
                       min_squeeze=1.0, max_squeeze=1.0,
                       min_rotate=-0.01, max_rotate=0.01)


def _sample_theta_pair(key, batch_size, height, width, global_ranges,
                       relative_ranges, vertical_mirror):
    k1, k2, k3 = jax.random.split(key, 3)
    theta0 = _identity_theta(batch_size)
    theta1 = _sample_thetas(k1, theta0, height=height, width=width, **global_ranges)
    theta2 = _sample_thetas(k2, theta1, height=height, width=width, **relative_ranges)
    return _mirror(k3, theta1, theta2, vertical=vertical_mirror)


class _AffineAugBase:
    """Wraps a jitted pure augmentation body; call as
    `batch, key = aug(batch, key)`."""

    vertical_mirror = True
    global_ranges = _GLOBAL_RANGES
    relative_ranges = _RELATIVE_RANGES

    def __init__(self, args=None, addnoise=True, crop=None):
        self._args = args
        self._addnoise = bool(addnoise)
        self._crop = tuple(int(c) for c in crop) if crop else None

        def run(batch, key, *, _body=self._body, _an=self._addnoise,
                _cr=self._crop):
            from ..nn.core import normalize_image_batch
            return _body(normalize_image_batch(batch), key,
                         addnoise=_an, crop=_cr)

        self._jitted = jax.jit(run)

    def __call__(self, batch, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        key, sub = jax.random.split(key)
        return self._jitted(dict(batch), sub), key


class RandomAffineFlow(_AffineAugBase):
    """FlowNet on plain FlyingChairs (augmentations.py:135-365)."""

    @classmethod
    def _body(cls, batch, key, *, addnoise, crop):
        im1, im2, flo = batch["input1"], batch["input2"], batch["target1"]
        b, h, w, _ = im1.shape
        k_theta, k_noise = jax.random.split(key)
        theta1, theta2 = _sample_theta_pair(
            k_theta, b, h, w, cls.global_ranges, cls.relative_ranges,
            cls.vertical_mirror)
        im1 = transform_image(im1, theta1)
        im2 = transform_image(im2, theta2)
        flo = transform_flow(flo, theta1, theta2)
        if addnoise:
            im1, im2 = _add_noise(k_noise, im1, im2)
        batch.update(input1=im1, input2=im2, target1=flo)
        return batch


class RandomAffineFlowOcc(_AffineAugBase):
    """Chairs-Occ / Things3D: bidirectional flow + occ maps, out-of-bounds
    OR-ed into occ, optional post-crop (augmentations.py:368-653)."""

    @classmethod
    def _body(cls, batch, key, *, addnoise, crop):
        im1, im2 = batch["input1"], batch["input2"]
        flo_f, flo_b = batch["target1"], batch["target2"]
        occ1, occ2 = batch["target_occ1"], batch["target_occ2"]
        b, h, w, _ = im1.shape
        k_theta, k_noise, k_crop = jax.random.split(key, 3)
        theta1, theta2 = _sample_theta_pair(
            k_theta, b, h, w, cls.global_ranges, cls.relative_ranges,
            cls.vertical_mirror)
        im1 = transform_image(im1, theta1)
        im2 = transform_image(im2, theta2)
        flo_f = transform_flow(flo_f, theta1, theta2)
        flo_b = transform_flow(flo_b, theta2, theta1)
        occ1 = transform_image(occ1, theta1)
        occ2 = transform_image(occ2, theta2)
        if addnoise:
            im1, im2 = _add_noise(k_noise, im1, im2)
        if crop is not None:
            im1, im2, flo_f, flo_b, occ1, occ2 = _random_crop(
                k_crop, [im1, im2, flo_f, flo_b, occ1, occ2], crop)
        occ1 = check_out_of_bound(flo_f, occ1)
        occ2 = check_out_of_bound(flo_b, occ2)
        batch.update(input1=im1, input2=im2, target1=flo_f, target2=flo_b,
                     target_occ1=occ1, target_occ2=occ2)
        return batch


class RandomAffineFlowOccSintel(_AffineAugBase):
    """Sintel fine-tune: forward-only targets (augmentations.py:656-932)."""

    @classmethod
    def _body(cls, batch, key, *, addnoise, crop):
        im1, im2 = batch["input1"], batch["input2"]
        flo_f, occ1 = batch["target1"], batch["target_occ1"]
        b, h, w, _ = im1.shape
        k_theta, k_noise, k_crop = jax.random.split(key, 3)
        theta1, theta2 = _sample_theta_pair(
            k_theta, b, h, w, cls.global_ranges, cls.relative_ranges,
            cls.vertical_mirror)
        im1 = transform_image(im1, theta1)
        im2 = transform_image(im2, theta2)
        flo_f = transform_flow(flo_f, theta1, theta2)
        occ1 = transform_image(occ1, theta1)
        if addnoise:
            im1, im2 = _add_noise(k_noise, im1, im2)
        if crop is not None:
            im1, im2, flo_f, occ1 = _random_crop(
                k_crop, [im1, im2, flo_f, occ1], crop)
        occ1 = check_out_of_bound(flo_f, occ1)
        batch.update(input1=im1, input2=im2, target1=flo_f, target_occ1=occ1)
        return batch


class RandomAffineFlowOccKITTI(_AffineAugBase):
    """KITTI fine-tune: milder affines, no vertical mirror, flow warped with
    the validity mask, no occ handling (augmentations.py:935-1210)."""

    vertical_mirror = False
    global_ranges = _KITTI_GLOBAL
    relative_ranges = _KITTI_RELATIVE

    @classmethod
    def _body(cls, batch, key, *, addnoise, crop):
        im1, im2 = batch["input1"], batch["input2"]
        flo_f, valid = batch["target1"], batch["input_valid"]
        b, h, w, _ = im1.shape
        k_theta, k_noise, k_crop = jax.random.split(key, 3)
        theta1, theta2 = _sample_theta_pair(
            k_theta, b, h, w, cls.global_ranges, cls.relative_ranges,
            cls.vertical_mirror)
        im1 = transform_image(im1, theta1)
        im2 = transform_image(im2, theta2)
        flo_f, valid = transform_flow_masked(flo_f, theta1, theta2, valid)
        if addnoise:
            im1, im2 = _add_noise(k_noise, im1, im2)
        if crop is not None:
            im1, im2, flo_f, valid = _random_crop(
                k_crop, [im1, im2, flo_f, valid], crop)
        # target2 mirrors target1 in the KITTI pipeline (kitti_combined.py:365)
        batch.update(input1=im1, input2=im2, target1=flo_f, target2=flo_f,
                     input_valid=valid)
        return batch
