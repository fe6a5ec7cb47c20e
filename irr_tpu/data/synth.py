"""Synthetic FlyingChairsOcc-style scene generator.

No real dataset is reachable from this environment (the reference's data
and LFS checkpoints are external), so accuracy runs train on synthesized
layered-affine scenes that follow the same generative recipe as
FlyingChairs (reference datasets/flyingchairsOcc.py consumes the output
verbatim): a textured background plus K foreground objects, each moving
by its own affine transform between the two frames. Ground-truth forward
and backward flow and both occlusion maps come from exact layer
visibility, so the data has the properties the model family is built to
learn: piecewise-smooth flow, motion discontinuities at object
boundaries, and real (geometric) occlusion, not noise labels.

Files written per sample (the glob contract of FlyingChairsOcc,
irr_tpu/data/datasets.py:122-127): NNNNN_img1.png, _img2.png, _occ1.png,
_occ2.png, _flow.flo, _flow_b.flo.
"""

import os

import numpy as np

from ..utils.flow_io import write_flo

H_DEF, W_DEF = 384, 512


def _smooth_noise(rng, h, w, cells, lo=0.0, hi=1.0, ch=3):
    """Band-limited value noise: bilinear upsample of a coarse random grid."""
    gh, gw = cells, max(2, int(round(cells * w / h)))
    g = rng.rand(gh, gw, ch).astype(np.float32)
    yy = np.linspace(0, gh - 1, h, dtype=np.float32)
    xx = np.linspace(0, gw - 1, w, dtype=np.float32)
    y0 = np.clip(yy.astype(np.int32), 0, gh - 2)
    x0 = np.clip(xx.astype(np.int32), 0, gw - 2)
    fy = (yy - y0)[:, None, None]
    fx = (xx - x0)[None, :, None]
    out = (g[y0][:, x0] * (1 - fy) * (1 - fx) + g[y0][:, x0 + 1] * (1 - fy) * fx
           + g[y0 + 1][:, x0] * fy * (1 - fx) + g[y0 + 1][:, x0 + 1] * fy * fx)
    return lo + (hi - lo) * out


def _texture(rng, h, w):
    """Multi-octave textured RGB in [0,1] with enough local structure for
    matching (coarse color + mid detail + fine grain)."""
    t = (0.55 * _smooth_noise(rng, h, w, 3)
         + 0.3 * _smooth_noise(rng, h, w, 12)
         + 0.15 * _smooth_noise(rng, h, w, 48))
    return np.clip(t, 0.0, 1.0)


def _bilinear(img, y, x, fill=None):
    """Sample img (H,W,C) at float coords; out-of-range -> fill (or clamp)."""
    h, w = img.shape[:2]
    y0 = np.floor(y).astype(np.int32)
    x0 = np.floor(x).astype(np.int32)
    fy = (y - y0)[..., None]
    fx = (x - x0)[..., None]
    y0c = np.clip(y0, 0, h - 1)
    y1c = np.clip(y0 + 1, 0, h - 1)
    x0c = np.clip(x0, 0, w - 1)
    x1c = np.clip(x0 + 1, 0, w - 1)
    out = (img[y0c, x0c] * (1 - fy) * (1 - fx) + img[y0c, x1c] * (1 - fy) * fx
           + img[y1c, x0c] * fy * (1 - fx) + img[y1c, x1c] * fy * fx)
    if fill is not None:
        oob = (y < 0) | (y > h - 1) | (x < 0) | (x > w - 1)
        out = np.where(oob[..., None], np.asarray(fill, out.dtype), out)
    return out


def _rand_affine(rng, h, w, t_max, rot_max_deg, scale_rng):
    """2x3 affine mapping t1 pixel coords -> t2 pixel coords, rotating and
    scaling about a random in-frame center."""
    ang = np.deg2rad(rng.uniform(-rot_max_deg, rot_max_deg))
    s = rng.uniform(*scale_rng)
    ca, sa = np.cos(ang) * s, np.sin(ang) * s
    cx = rng.uniform(0.25 * w, 0.75 * w)
    cy = rng.uniform(0.25 * h, 0.75 * h)
    tx = rng.uniform(-t_max, t_max)
    ty = rng.uniform(-t_max, t_max)
    # p' = R (p - c) + c + t
    a = np.array([[ca, -sa, cx - ca * cx + sa * cy + tx],
                  [sa, ca, cy - sa * cx - ca * cy + ty]], np.float64)
    return a


def _affine_inv(a):
    m = a[:, :2]
    mi = np.linalg.inv(m)
    ti = -mi @ a[:, 2]
    return np.concatenate([mi, ti[:, None]], axis=1)


def _apply(a, y, x):
    """a maps (x, y) pixel coords; returns (y', x') as float32."""
    a = a.astype(np.float32)
    xp = a[0, 0] * x + a[0, 1] * y + a[0, 2]
    yp = a[1, 0] * x + a[1, 1] * y + a[1, 2]
    return yp, xp


_GRID_CACHE = {}


def _grid(h, w):
    if (h, w) not in _GRID_CACHE:
        _GRID_CACHE[(h, w)] = np.meshgrid(
            np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32),
            indexing="ij")
    return _GRID_CACHE[(h, w)]


def _object_mask(rng, h, w):
    """Random filled polygon (blob) mask via PIL, roughly 8-25% of frame."""
    from PIL import Image, ImageDraw
    n_vert = rng.randint(5, 10)
    cx = rng.uniform(0.2 * w, 0.8 * w)
    cy = rng.uniform(0.2 * h, 0.8 * h)
    rad = rng.uniform(0.12, 0.28) * min(h, w)
    angs = np.sort(rng.uniform(0, 2 * np.pi, n_vert))
    rr = rad * rng.uniform(0.6, 1.3, n_vert)
    pts = [(cx + r * np.cos(a), cy + r * np.sin(a)) for r, a in zip(rr, angs)]
    im = Image.new("L", (w, h), 0)
    ImageDraw.Draw(im).polygon(pts, fill=255)
    return np.asarray(im) > 127


def make_scene(rng, h=H_DEF, w=W_DEF, n_objects=None):
    """One layered-affine scene.

    Returns dict with uint8 img1/img2, float32 flow_f/flow_b (HWC2),
    uint8 occ1/occ2 (0/255)."""
    if n_objects is None:
        n_objects = rng.randint(2, 6)
    yy, xx = _grid(h, w)

    # Layer 0 = background, layers 1..K = objects (K topmost).
    affines = [_rand_affine(rng, h, w, t_max=12.0, rot_max_deg=3.0,
                            scale_rng=(0.97, 1.03))]
    textures = [_texture(rng, h, w)]
    masks1 = [np.ones((h, w), bool)]
    for _ in range(n_objects):
        affines.append(_rand_affine(rng, h, w, t_max=28.0, rot_max_deg=12.0,
                                    scale_rng=(0.85, 1.15)))
        textures.append(_texture(rng, h, w))
        masks1.append(_object_mask(rng, h, w))

    invs = [_affine_inv(a) for a in affines]

    # t1 compositing: top index per pixel (painter's order, last on top)
    top1 = np.zeros((h, w), np.int32)
    img1 = textures[0].copy()
    for k in range(1, len(masks1)):
        img1[masks1[k]] = textures[k][masks1[k]]
        top1[masks1[k]] = k

    # t2 masks/textures: layer k occupies f_k(M_k); sample via inverse map
    img2 = None
    top2 = np.zeros((h, w), np.int32)
    masks2 = []
    for k, (tex, inv) in enumerate(zip(textures, invs)):
        ys, xs = _apply(inv, yy, xx)
        tex_w = _bilinear(tex, ys, xs, fill=None)  # clamp: bg covers frame
        if k == 0:
            m2 = np.ones((h, w), bool)
            img2 = tex_w
        else:
            ysr = np.clip(np.rint(ys).astype(np.int32), 0, h - 1)
            xsr = np.clip(np.rint(xs).astype(np.int32), 0, w - 1)
            inside = (ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1)
            m2 = inside & masks1[k][ysr, xsr]
            img2[m2] = tex_w[m2]
            top2[m2] = k
        masks2.append(m2)

    # Forward flow + occ1 from t1 visibility
    flow_f = np.zeros((h, w, 2), np.float32)
    occ1 = np.zeros((h, w), bool)
    for k, a in enumerate(affines):
        sel = top1 == k
        if not sel.any():
            continue
        yp, xp = _apply(a, yy, xx)
        flow_f[sel, 0] = (xp - xx)[sel].astype(np.float32)
        flow_f[sel, 1] = (yp - yy)[sel].astype(np.float32)
        ypr = np.clip(np.rint(yp).astype(np.int32), 0, h - 1)
        xpr = np.clip(np.rint(xp).astype(np.int32), 0, w - 1)
        oob = (yp < 0) | (yp > h - 1) | (xp < 0) | (xp > w - 1)
        covered = top2[ypr, xpr] != k
        occ1[sel] = (oob | covered)[sel]

    # Backward flow + occ2 from t2 visibility
    flow_b = np.zeros((h, w, 2), np.float32)
    occ2 = np.zeros((h, w), bool)
    for k, inv in enumerate(invs):
        sel = top2 == k
        if not sel.any():
            continue
        ys, xs = _apply(inv, yy, xx)
        flow_b[sel, 0] = (xs - xx)[sel].astype(np.float32)
        flow_b[sel, 1] = (ys - yy)[sel].astype(np.float32)
        ysr = np.clip(np.rint(ys).astype(np.int32), 0, h - 1)
        xsr = np.clip(np.rint(xs).astype(np.int32), 0, w - 1)
        oob = (ys < 0) | (ys > h - 1) | (xs < 0) | (xs > w - 1)
        covered = top1[ysr, xsr] != k
        occ2[sel] = (oob | covered)[sel]

    return {
        "img1": (np.clip(img1, 0, 1) * 255).astype(np.uint8),
        "img2": (np.clip(img2, 0, 1) * 255).astype(np.uint8),
        "flow_f": flow_f,
        "flow_b": flow_b,
        "occ1": occ1.astype(np.uint8) * 255,
        "occ2": occ2.astype(np.uint8) * 255,
    }


def generate_chairs_occ(root, n, h=H_DEF, w=W_DEF, seed=0, start=0):
    """Write n samples in FlyingChairsOcc layout under root."""
    from PIL import Image
    os.makedirs(root, exist_ok=True)
    for i in range(start, start + n):
        rng = np.random.RandomState(seed * 1000003 + i)
        s = make_scene(rng, h, w)
        stem = os.path.join(root, "%05d" % (i + 1))
        # compress_level=1: identical pixels, ~3x faster encode; the scene
        # math (not the PNG writer) should own generation wall-time.
        Image.fromarray(s["img1"]).save(stem + "_img1.png", compress_level=1)
        Image.fromarray(s["img2"]).save(stem + "_img2.png", compress_level=1)
        Image.fromarray(s["occ1"]).save(stem + "_occ1.png", compress_level=1)
        Image.fromarray(s["occ2"]).save(stem + "_occ2.png", compress_level=1)
        write_flo(stem + "_flow.flo", s["flow_f"])
        write_flo(stem + "_flow_b.flo", s["flow_b"])


# Real KITTI-2015 native frame sizes (the dataset uses a handful of camera
# crops in this range); all land in the single (384, 1280) pad bucket at
# multiple=64 (datasets.py pad_to_multiple).
_KITTI_SIZES = [(375, 1242), (370, 1224), (374, 1238), (376, 1241)]


def generate_kitti(root, n=200, seed=0, start=0, sizes=None):
    """Write n frame pairs in KITTI-2015 scene-flow layout under root.

    Layout is the glob contract of KittiComb2015* (datasets.py:497-507,
    mirroring reference datasets/kitti_combined.py):
      root/data_scene_flow/training/image_2/%06d_1{0,1}.png
      root/data_scene_flow/training/flow_occ/%06d_10.png  (16-bit u,v,valid)

    KITTI ground truth is sparse (lidar accumulation), so validity is
    simulated with a vertical density ramp — near-empty sky at the top,
    ~75% dense road at the bottom — giving the sparse masked losses and
    their per-image valid-count normalization realistic structure. Frame
    sizes cycle through the real KITTI native range so the padded
    single-bucket eval path is exercised on true native shapes.
    n=200 matches the real KITTI-2015 training set, so the frozen
    KITTI_2015_VALIDATE_INDICES split (40 val / 160 train) applies as-is.
    """
    from PIL import Image
    from ..utils.flow_io import write_flow_png
    img_dir = os.path.join(root, "data_scene_flow", "training", "image_2")
    flo_dir = os.path.join(root, "data_scene_flow", "training", "flow_occ")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(flo_dir, exist_ok=True)
    sizes = sizes or _KITTI_SIZES
    for i in range(start, start + n):
        rng = np.random.RandomState(seed * 2000003 + i)
        h, w = sizes[i % len(sizes)]
        s = make_scene(rng, h, w)
        density = np.linspace(0.02, 0.75, h, dtype=np.float32)[:, None]
        valid = (rng.rand(h, w) < density).astype(np.uint16)
        stem = "%06d" % i
        Image.fromarray(s["img1"]).save(
            os.path.join(img_dir, stem + "_10.png"), compress_level=1)
        Image.fromarray(s["img2"]).save(
            os.path.join(img_dir, stem + "_11.png"), compress_level=1)
        write_flow_png(os.path.join(flo_dir, stem + "_10.png"),
                       s["flow_f"], mask=valid)


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True)
    p.add_argument("--n", type=int, default=2200)
    p.add_argument("--height", type=int, default=H_DEF)
    p.add_argument("--width", type=int, default=W_DEF)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--start", type=int, default=0,
                   help="first sample index (for parallel sharding)")
    p.add_argument("--layout", choices=["chairs_occ", "kitti2015"],
                   default="chairs_occ",
                   help="kitti2015 ignores --height/--width (native sizes)")
    a = p.parse_args(argv)
    if a.layout == "kitti2015":
        generate_kitti(a.root, a.n, a.seed, a.start)
    else:
        generate_chairs_occ(a.root, a.n, a.height, a.width, a.seed, a.start)
    print("wrote %d samples to %s" % (a.n, a.root))


if __name__ == "__main__":
    main()
