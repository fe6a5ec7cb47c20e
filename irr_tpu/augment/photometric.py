"""On-device photometric augmentation (resident-dataset mode).

The host pipeline applies ColorJitter(0.5,0.5,0.5,0.5) in uint8 (PIL
bit-exact, data/transforms.py) followed by ToTensor and RandomGamma in
float, per example, inside Dataset.__getitem__. In HBM-resident mode the
decoded images are uploaded ONCE, so per-epoch photometric randomness
must happen on device. This module is the jnp equivalent:
DISTRIBUTION-equivalent, not bit-exact — all four jitter ops run in
float [0,1] with the same random-factor laws and the same random op
order as torchvision's ColorJitter (reference datasets/transforms.py
chain, e.g. flyingchairsOcc.py:148-163), and both frames of a pair share
one parameter draw (the reference concatenates the pair before the
chain). PIL's uint8 truncation between ops is the only dropped detail.

Factor laws (torchvision ColorJitter(0.5,0.5,0.5,0.5) + RandomGamma):
  brightness, contrast, saturation ~ U[0.5, 1.5]; hue ~ U[-0.5, 0.5];
  gamma ~ U[0.7, 1.5] with clip.
Grayscale weights are PIL's fixed-point L coefficients (19595, 38470,
7471) / 65536 — the same constants the host path uses.
"""

import jax
import jax.numpy as jnp

_LUMA = (19595.0 / 65536.0, 38470.0 / 65536.0, 7471.0 / 65536.0)


def _grayscale(x):
    return (_LUMA[0] * x[..., 0] + _LUMA[1] * x[..., 1]
            + _LUMA[2] * x[..., 2])


def _brightness(x, f):
    return jnp.clip(x * f, 0.0, 1.0)


def _contrast(x, f):
    # PIL Contrast: blend toward the scalar mean of the grayscale image
    # (over the whole concatenated pair, matching the host chain).
    mean = jnp.mean(_grayscale(x))
    return jnp.clip(mean + (x - mean) * f, 0.0, 1.0)


def _saturation(x, f):
    gray = _grayscale(x)[..., None]
    return jnp.clip(gray + (x - gray) * f, 0.0, 1.0)


def _rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.max(x, axis=-1)
    minc = jnp.min(x, axis=-1)
    c = maxc - minc
    safe_c = jnp.where(c == 0, 1.0, c)
    rc = (maxc - r) / safe_c
    gc = (maxc - g) / safe_c
    bc = (maxc - b) / safe_c
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(c == 0, 0.0, (h / 6.0) % 1.0)
    s = jnp.where(maxc == 0, 0.0, c / jnp.where(maxc == 0, 1.0, maxc))
    return h, s, maxc


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    sel = [i == k for k in range(6)]
    r = jnp.select(sel, [v, q, p, p, t, v])
    g = jnp.select(sel, [t, v, v, q, p, p])
    b = jnp.select(sel, [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _hue(x, f):
    h, s, v = _rgb_to_hsv(x)
    return jnp.clip(_hsv_to_rgb((h + f) % 1.0, s, v), 0.0, 1.0)


def _jitter_one(x, perm, factors):
    """Apply the 4 jitter ops to one image in the order given by perm.

    lax.switch under vmap lowers to a select over all branches — 16 cheap
    elementwise op evaluations per image, negligible next to the step.
    """
    fb, fc, fs, fh = factors

    branches = [lambda y: _brightness(y, fb),
                lambda y: _contrast(y, fc),
                lambda y: _saturation(y, fs),
                lambda y: _hue(y, fh)]

    def body(j, y):
        return jax.lax.switch(perm[j], branches, y)

    return jax.lax.fori_loop(0, 4, body, x)


def photometric_pair_batch(im1_u8, im2_u8, key):
    """Jitter + gamma a batch of uint8 image pairs; returns float32 [0,1].

    One parameter draw per batch ELEMENT, shared by both frames (the host
    chain concatenates the pair along H so every factor — including the
    contrast/grayscale mean — sees both frames at once; replicated here).
    """
    b, h = im1_u8.shape[0], im1_u8.shape[1]
    both = jnp.concatenate([im1_u8, im2_u8], axis=1).astype(jnp.float32) / 255.0

    k_f, k_h, k_p, k_g = jax.random.split(key, 4)
    f = jax.random.uniform(k_f, (b, 3), minval=0.5, maxval=1.5)
    fh = jax.random.uniform(k_h, (b,), minval=-0.5, maxval=0.5)
    perms = jax.vmap(lambda k: jax.random.permutation(k, 4))(
        jax.random.split(k_p, b))
    gamma = jax.random.uniform(k_g, (b,), minval=0.7, maxval=1.5)

    def per_example(x, perm, f3, fh1, g):
        y = _jitter_one(x, perm, (f3[0], f3[1], f3[2], fh1))
        return jnp.clip(y ** g, 0.0, 1.0)

    out = jax.vmap(per_example)(both, perms, f, fh, gamma)
    return out[:, :h], out[:, h:]
