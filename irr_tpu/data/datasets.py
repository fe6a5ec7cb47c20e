"""Dataset classes (host-side, numpy HWC examples).

All 32 registry names of the reference (datasets/__init__.py:1-55) with the
same example_dict contract — keys input1/input2 (float32 [0,1]),
target1/target2 (flow), target_occ1/target_occ2, input_valid (KITTI),
index, basename, basedir (Sintel) — except layout: images/flows are HWC
(the framework is NHWC end-to-end).

Frozen validation splits live in splits.py. Filename pairing mirrors the
reference exactly (cited per class).
"""

import os
from glob import glob

import numpy as np

from . import common
from .splits import (FLYINGCHAIRS_VALIDATE_INDICES,
                     FLYINGCHAIRS_OCC_VALIDATE_INDICES,
                     SINTEL_VALIDATE_INDICES,
                     KITTI_2012_VALIDATE_INDICES,
                     KITTI_2015_VALIDATE_INDICES)
from .transforms import PhotometricPair


def _split_indices(n, validate_indices, dstype):
    valid = [x for x in validate_indices if x in range(n)]
    if dstype == "train":
        return [x for x in range(n) if x not in valid]
    if dstype == "valid":
        return valid
    if dstype == "full":
        return list(range(n))
    raise ValueError(f"dstype '{dstype}' unknown!")


class Dataset:
    """Base: subclasses fill _image_list (+ optional target lists).

    Random augmentation draws are made from a PER-EXAMPLE RandomState seeded
    by (base_seed, epoch, index), so results are deterministic and
    independent of iteration order — a requirement for the loader's
    parallel example decode (loader.py num_workers > 1). The loader calls
    set_epoch() so repeated passes draw fresh parameters.
    """

    def __init__(self, photometric_augmentations=False, rng=None):
        self._rng = rng if rng is not None else np.random
        self._base_seed = int(self._rng.randint(0, 2 ** 31 - 1))
        self._epoch = 0
        self._photo = PhotometricPair(enabled=photometric_augmentations, rng=self._rng)

    def set_epoch(self, epoch):
        self._epoch = int(epoch)

    def _example_rng(self, index):
        mix = (self._base_seed + 1000003 * self._epoch + 8191 * int(index)) % (2 ** 31 - 1)
        return np.random.RandomState(mix)

    def __len__(self):
        return self._size

    def _finalize(self):
        self._size = len(self._image_list)
        assert self._size != 0


# ---------------------------------------------------------------------------
# FlyingChairs (reference datasets/flyingchairs.py)
# ---------------------------------------------------------------------------

class FlyingChairs(Dataset):
    def __init__(self, args=None, root=None, photometric_augmentations=False,
                 dstype="train", rng=None):
        super().__init__(photometric_augmentations, rng)
        image_filenames = sorted(glob(os.path.join(root, "*.ppm")))
        flow_filenames = sorted(glob(os.path.join(root, "*.flo")))
        assert len(image_filenames) / 2 == len(flow_filenames)
        idxs = _split_indices(len(flow_filenames), FLYINGCHAIRS_VALIDATE_INDICES, dstype)
        self._image_list = [[image_filenames[2 * i], image_filenames[2 * i + 1]] for i in idxs]
        self._flow_list = [flow_filenames[i] for i in idxs]
        self._finalize()

    def __getitem__(self, index):
        index = index % self._size
        im1 = common.read_image_as_byte(self._image_list[index][0])
        im2 = common.read_image_as_byte(self._image_list[index][1])
        flo = common.read_flo(self._flow_list[index])
        im1, im2 = self._photo(im1, im2, rng=self._example_rng(index))
        return {
            "input1": im1, "input2": im2, "target1": flo,
            "index": index,
            "basename": os.path.basename(self._image_list[index][0])[:5],
        }


class FlyingChairsTrain(FlyingChairs):
    def __init__(self, args=None, root=None, photometric_augmentations=True, rng=None):
        super().__init__(args, root, photometric_augmentations, "train", rng)


class FlyingChairsValid(FlyingChairs):
    def __init__(self, args=None, root=None, photometric_augmentations=False, rng=None):
        super().__init__(args, root, photometric_augmentations, "valid", rng)


class FlyingChairsFull(FlyingChairs):
    def __init__(self, args=None, root=None, photometric_augmentations=False, rng=None):
        super().__init__(args, root, photometric_augmentations, "full", rng)


# ---------------------------------------------------------------------------
# FlyingChairsOcc (reference datasets/flyingchairsOcc.py:81-247)
# ---------------------------------------------------------------------------

class FlyingChairsOcc(Dataset):
    def __init__(self, args=None, root=None, photometric_augmentations=False,
                 dstype="train", rng=None):
        super().__init__(photometric_augmentations, rng)
        image1 = sorted(glob(os.path.join(root, "*_img1.png")))
        image2 = sorted(glob(os.path.join(root, "*_img2.png")))
        occ1 = sorted(glob(os.path.join(root, "*_occ1.png")))
        occ2 = sorted(glob(os.path.join(root, "*_occ2.png")))
        flow_f = sorted(glob(os.path.join(root, "*_flow.flo")))
        flow_b = sorted(glob(os.path.join(root, "*_flow_b.flo")))
        assert len(image1) == len(image2) == len(occ1) == len(occ2) \
            == len(flow_f) == len(flow_b)
        idxs = _split_indices(len(flow_f), FLYINGCHAIRS_OCC_VALIDATE_INDICES, dstype)
        self._image_list = [[image1[i], image2[i]] for i in idxs]
        self._flow_list = [[flow_f[i], flow_b[i]] for i in idxs]
        self._occ_list = [[occ1[i], occ2[i]] for i in idxs]
        self._finalize()

    def __getitem__(self, index):
        index = index % self._size
        im1 = common.read_image_as_byte(self._image_list[index][0])
        im2 = common.read_image_as_byte(self._image_list[index][1])
        flo_f = common.read_flo(self._flow_list[index][0])
        flo_b = common.read_flo(self._flow_list[index][1])
        o1 = common.read_occ_image_as_uint8(self._occ_list[index][0])
        o2 = common.read_occ_image_as_uint8(self._occ_list[index][1])
        im1, im2 = self._photo(im1, im2, rng=self._example_rng(index))
        return {
            "input1": im1, "input2": im2,
            "target1": flo_f, "target2": flo_b,
            "target_occ1": o1, "target_occ2": o2,
            "index": index,
            "basename": os.path.basename(self._image_list[index][0])[:5],
        }


class FlyingChairsOccTrain(FlyingChairsOcc):
    def __init__(self, args=None, root=None, photometric_augmentations=True, rng=None):
        super().__init__(args, root, photometric_augmentations, "train", rng)


class FlyingChairsOccValid(FlyingChairsOcc):
    def __init__(self, args=None, root=None, photometric_augmentations=False, rng=None):
        super().__init__(args, root, photometric_augmentations, "valid", rng)


class FlyingChairsOccFull(FlyingChairsOcc):
    def __init__(self, args=None, root=None, photometric_augmentations=False, rng=None):
        super().__init__(args, root, photometric_augmentations, "full", rng)


# ---------------------------------------------------------------------------
# FlyingThings3D subset (reference datasets/flyingThings3D.py)
# ---------------------------------------------------------------------------

def filling_in_nan(flow):
    """4-neighbor in-painting of NaN flow values (flyingThings3D.py:15-38)."""
    h, w, _ = flow.shape
    for (y, x, c) in np.argwhere(np.isnan(flow)):
        total, count = 0.0, 0
        for dy, dx in ((-1, 0), (1, 0), (0, -1)):
            yy, xx = y + dy, x + dx
            if 0 <= yy < h and 0 <= xx < w and not np.isnan(flow[yy, xx, c]):
                total += flow[yy, xx, c]
                count += 1
        flow[y, x, c] = total / max(count, 1)
    return flow


class FlyingThings3d(Dataset):
    def __init__(self, args=None, images_root=None, flow_root=None, occ_root=None,
                 photometric_augmentations=False, rng=None):
        super().__init__(photometric_augmentations, rng)
        flow_f = sorted(glob(os.path.join(flow_root, "into_future/*.flo")))
        self._image_list, self._flow_list, self._occ_list = [], [], []
        for flo_f in flow_f:
            # frame pairing by index: backward flow / second frame are idx+1
            # (flyingThings3D.py:87-107)
            idx_f = os.path.splitext(os.path.basename(flo_f))[0]
            idx_b = str(int(idx_f) + 1).zfill(7)
            flo_b = os.path.join(flow_root, "into_past", idx_b + ".flo")
            im1 = os.path.join(images_root, idx_f + ".png")
            im2 = os.path.join(images_root, idx_b + ".png")
            occ1 = os.path.join(occ_root, "into_future", idx_f + ".png")
            occ2 = os.path.join(occ_root, "into_past", idx_b + ".png")
            if not all(os.path.isfile(p) for p in (flo_f, flo_b, im1, im2, occ1, occ2)):
                continue
            self._image_list.append([im1, im2])
            self._flow_list.append([flo_f, flo_b])
            self._occ_list.append([occ1, occ2])
        self._finalize()

    def __getitem__(self, index):
        index = index % self._size
        im1 = common.read_image_as_byte(self._image_list[index][0])
        im2 = common.read_image_as_byte(self._image_list[index][1])
        flo_f = common.read_flo(self._flow_list[index][0])
        flo_b = common.read_flo(self._flow_list[index][1])
        o1 = common.read_occ_image_as_uint8(self._occ_list[index][0])
        o2 = common.read_occ_image_as_uint8(self._occ_list[index][1])
        if np.any(np.isnan(flo_f)):
            flo_f = filling_in_nan(flo_f)
        if np.any(np.isnan(flo_b)):
            flo_b = filling_in_nan(flo_b)
        im1, im2 = self._photo(im1, im2, rng=self._example_rng(index))
        return {
            "input1": im1, "input2": im2,
            "target1": flo_f, "target2": flo_b,
            "target_occ1": o1, "target_occ2": o2,
            "index": index,
            "basename": os.path.basename(self._image_list[index][0])[:5],
        }


class FlyingThings3dFinalTrain(FlyingThings3d):
    def __init__(self, args=None, root=None, photometric_augmentations=True, rng=None):
        super().__init__(args, os.path.join(root, "frames_finalpass"),
                         os.path.join(root, "optical_flow"),
                         os.path.join(root, "occlusion"),
                         photometric_augmentations, rng)


class FlyingThings3dFinalTest(FlyingThings3d):
    def __init__(self, args=None, root=None, photometric_augmentations=False, rng=None):
        super().__init__(args, os.path.join(root, "frames_finalpass"),
                         os.path.join(root, "optical_flow"),
                         os.path.join(root, "occlusion"),
                         photometric_augmentations, rng)


class FlyingThings3dCleanTrain(FlyingThings3d):
    def __init__(self, args=None, root=None, photometric_augmentations=True, rng=None):
        super().__init__(args, os.path.join(root, "train", "image_clean", "left"),
                         os.path.join(root, "train", "flow", "left"),
                         os.path.join(root, "train", "flow_occlusions", "left"),
                         photometric_augmentations, rng)


class FlyingThings3dCleanTest(FlyingThings3d):
    def __init__(self, args=None, root=None, photometric_augmentations=False, rng=None):
        super().__init__(args, os.path.join(root, "frames_cleanpass"),
                         os.path.join(root, "optical_flow"),
                         os.path.join(root, "occlusion"),
                         photometric_augmentations, rng)


# ---------------------------------------------------------------------------
# Sintel (reference datasets/sintel.py)
# ---------------------------------------------------------------------------

def _cd_dotdot(path):
    return os.path.abspath(os.path.join(os.path.dirname(path), os.pardir))


class _Sintel(Dataset):
    def __init__(self, args=None, dir_root=None, photometric_augmentations=False,
                 imgtype=None, dstype=None, rng=None):
        super().__init__(photometric_augmentations, rng)
        images_root = os.path.join(dir_root, "clean" if imgtype == "comb" else imgtype)
        flow_root = os.path.join(dir_root, "flow")
        occ_root = os.path.join(dir_root, "occlusions_rev")  # sintel.py:44
        for d in (images_root, flow_root, occ_root):
            if not os.path.isdir(d):
                raise ValueError(f"directory '{d}' not found!")

        all_flo = sorted(glob(os.path.join(flow_root, "*/*.flo")))
        all_occ = sorted(glob(os.path.join(occ_root, "*/*.png")))
        all_img = sorted(glob(os.path.join(images_root, "*/*.png")))
        self._subtract_base = _cd_dotdot(images_root)

        base_folders = sorted({os.path.basename(os.path.dirname(fn)) for fn in all_img})
        self._image_list, self._flow_list, self._occ_list = [], [], []
        for folder in base_folders:
            imgs = [x for x in all_img if os.sep + folder + os.sep in x]
            flos = [x for x in all_flo if os.sep + folder + os.sep in x]
            occs = [x for x in all_occ if os.sep + folder + os.sep in x]
            for i in range(len(imgs) - 1):
                im1, im2, flo, occ = imgs[i], imgs[i + 1], flos[i], occs[i]
                # frame-number sanity asserts (sintel.py:90-106)
                f1, n1 = os.path.splitext(os.path.basename(im1))[0].split("_")
                f2, n2 = os.path.splitext(os.path.basename(im2))[0].split("_")
                ff, nf = os.path.splitext(os.path.basename(flo))[0].split("_")
                fo, no = os.path.splitext(os.path.basename(occ))[0].split("_")
                assert f1 == f2 and int(n1) == int(n2) - 1
                assert f1 == ff and int(n1) == int(nf)
                assert f1 == fo and int(n1) == int(no)
                self._image_list.append([im1, im2])
                self._flow_list.append(flo)
                self._occ_list.append(occ)

        idxs = _split_indices(len(self._image_list), SINTEL_VALIDATE_INDICES, dstype)
        self._image_list = [self._image_list[i] for i in idxs]
        self._flow_list = [self._flow_list[i] for i in idxs]
        self._occ_list = [self._occ_list[i] for i in idxs]

        if imgtype == "comb":
            # clean + final concatenated, sharing flow/occ (sintel.py:137-141)
            finals = [[a.replace("clean", "final"), b.replace("clean", "final")]
                      for a, b in self._image_list]
            self._image_list += finals
            self._flow_list += self._flow_list
            self._occ_list += self._occ_list
        self._finalize()

    def __getitem__(self, index):
        index = index % self._size
        im1_fn, im2_fn = self._image_list[index]
        im1 = common.read_image_as_byte(im1_fn)
        im2 = common.read_image_as_byte(im2_fn)
        flo = common.read_flo(self._flow_list[index])
        occ = common.read_occ_image_as_uint8(self._occ_list[index])
        im1, im2 = self._photo(im1, im2, rng=self._example_rng(index))
        basedir = os.path.splitext(os.path.dirname(im1_fn).replace(self._subtract_base, "")[1:])[0]
        return {
            "input1": im1, "input2": im2,
            "target1": flo, "target_occ1": occ,
            "index": index,
            "basedir": basedir,
            "basename": os.path.splitext(os.path.basename(im1_fn))[0],
        }


class _SintelTest(Dataset):
    """Test split without GT (sintel.py:209-315)."""

    def __init__(self, args=None, dir_root=None, photometric_augmentations=False,
                 imgtype=None, rng=None):
        super().__init__(photometric_augmentations, rng)
        images_root = os.path.join(dir_root, imgtype)
        if not os.path.isdir(images_root):
            raise ValueError(f"directory '{images_root}' not found!")
        all_img = sorted(glob(os.path.join(images_root, "*/*.png")))
        self._subtract_base = _cd_dotdot(images_root)
        base_folders = sorted({os.path.basename(os.path.dirname(fn)) for fn in all_img})
        self._image_list = []
        for folder in base_folders:
            imgs = [x for x in all_img if os.sep + folder + os.sep in x]
            for i in range(len(imgs) - 1):
                f1, n1 = os.path.splitext(os.path.basename(imgs[i]))[0].split("_")
                f2, n2 = os.path.splitext(os.path.basename(imgs[i + 1]))[0].split("_")
                assert f1 == f2 and int(n1) == int(n2) - 1
                self._image_list.append([imgs[i], imgs[i + 1]])
        self._finalize()

    def __getitem__(self, index):
        index = index % self._size
        im1_fn, im2_fn = self._image_list[index]
        im1, im2 = self._photo(common.read_image_as_byte(im1_fn),
                               common.read_image_as_byte(im2_fn),
                               rng=self._example_rng(index))
        basedir = os.path.splitext(os.path.dirname(im1_fn).replace(self._subtract_base, "")[1:])[0]
        return {
            "input1": im1, "input2": im2, "index": index,
            "basedir": basedir,
            "basename": os.path.splitext(os.path.basename(im1_fn))[0],
        }


def _sintel_cls(imgtype, dstype):
    class _C(_Sintel):
        def __init__(self, args=None, root=None, photometric_augmentations=None, rng=None):
            if photometric_augmentations is None:
                photometric_augmentations = (dstype == "train" or dstype == "full")
            super().__init__(args, root, photometric_augmentations, imgtype, dstype, rng)
    return _C


SintelTrainingCleanTrain = _sintel_cls("clean", "train")
SintelTrainingCleanValid = _sintel_cls("clean", "valid")
SintelTrainingCleanFull = _sintel_cls("clean", "full")
SintelTrainingFinalTrain = _sintel_cls("final", "train")
SintelTrainingFinalValid = _sintel_cls("final", "valid")
SintelTrainingFinalFull = _sintel_cls("final", "full")
SintelTrainingCombTrain = _sintel_cls("comb", "train")
SintelTrainingCombValid = _sintel_cls("comb", "valid")
SintelTrainingCombFull = _sintel_cls("comb", "full")


class SintelTestClean(_SintelTest):
    def __init__(self, args=None, root=None, photometric_augmentations=False, rng=None):
        super().__init__(args, root, photometric_augmentations, "clean", rng)


class SintelTestFinal(_SintelTest):
    def __init__(self, args=None, root=None, photometric_augmentations=False, rng=None):
        super().__init__(args, root, photometric_augmentations, "final", rng)


# ---------------------------------------------------------------------------
# KITTI 2012 + 2015 (reference datasets/kitti_combined.py)
# ---------------------------------------------------------------------------

def kitti_random_crop(im1, im2, flo, valid, crop_h=370, crop_w=1224, rng=None):
    """Numpy-side random crop (kitti_combined.py:37-52)."""
    rng = rng if rng is not None else np.random
    h, w, _ = im1.shape
    x = int(rng.uniform(0, w - crop_w + 1))
    y = int(rng.uniform(0, h - crop_h + 1))
    sl = np.s_[y:y + crop_h, x:x + crop_w, :]
    return im1[sl], im2[sl], flo[sl], valid[sl]


def pad_to_multiple(arrs, multiple):
    """Zero-pad HWC arrays bottom/right to the next multiple (bucket-and-pad
    eval strategy, SURVEY §7 'hard parts'). All KITTI native sizes
    (370-376 × 1224-1242) land in ONE (384, 1280) bucket at multiple=64,
    so native-size evaluation compiles exactly once. Padding is
    metric-exact: the validity mask is zero-extended and every KITTI eval
    reduction is valid-masked with per-image valid-count normalization
    (losses.py MultiScaleEPE_PWC_Bi_Occ_upsample_KITTI eval branch)."""
    h, w = arrs[0].shape[:2]
    ph = -h % multiple
    pw = -w % multiple
    if ph == 0 and pw == 0:
        return arrs
    return [np.pad(a, ((0, ph), (0, pw), (0, 0))) for a in arrs]


class KittiComb(Dataset):
    def __init__(self, args=None, images_root_2015=None, flow_root_2015=None,
                 images_root_2012=None, flow_root_2012=None,
                 photometric_augmentations=False, preprocessing_crop=True,
                 pad_multiple=64, dstype="full", rng=None):
        super().__init__(photometric_augmentations, rng)
        self.preprocessing_crop = preprocessing_crop
        self.pad_multiple = int(pad_multiple or 0)
        self._has_gt = dstype != "test"
        self._image_list, self._flow_list = [], []

        def add(images_root, flow_root, validate_indices):
            img1 = sorted(glob(os.path.join(images_root, "*_10.png")))
            img2 = sorted(glob(os.path.join(images_root, "*_11.png")))
            flos = sorted(glob(os.path.join(flow_root, "*_10.png"))) if flow_root else None
            n = len(img1)
            idxs = _split_indices(n, validate_indices, dstype if dstype != "test" else "full")
            for i in idxs:
                assert os.path.basename(img1[i])[:-7] == os.path.basename(img2[i])[:-7]
                self._image_list.append([img1[i], img2[i]])
                if flos is not None:
                    self._flow_list.append(flos[i])

        if images_root_2015 is not None:
            add(images_root_2015, flow_root_2015, KITTI_2015_VALIDATE_INDICES)
        if images_root_2012 is not None:
            add(images_root_2012, flow_root_2012, KITTI_2012_VALIDATE_INDICES)
        self._finalize()

    def __getitem__(self, index):
        index = index % self._size
        im1_fn, im2_fn = self._image_list[index]
        im1 = common.read_image_as_byte(im1_fn)
        im2 = common.read_image_as_byte(im2_fn)
        out = {"index": index, "basename": os.path.basename(im1_fn)[:6]}
        rng = self._example_rng(index)
        if self._has_gt:
            flo, valid = common.read_png16_flow(self._flow_list[index])
            if self.preprocessing_crop:
                im1, im2, flo, valid = kitti_random_crop(im1, im2, flo, valid,
                                                         rng=rng)
            elif self.pad_multiple:
                # pre-pad size: save_outputs crops artifacts back to it
                # (KITTI submission PNGs must be native-resolution)
                out["input_size"] = (im1.shape[0], im1.shape[1])
                im1, im2, flo, valid = pad_to_multiple(
                    [im1, im2, flo, valid], self.pad_multiple)
            # target2 == target1 (kitti_combined.py:365: no backward GT)
            out.update({"target1": flo, "target2": flo, "input_valid": valid})
        elif not self.preprocessing_crop and self.pad_multiple:
            out["input_size"] = (im1.shape[0], im1.shape[1])
            im1, im2 = pad_to_multiple([im1, im2], self.pad_multiple)
        im1, im2 = self._photo(im1, im2, rng=rng)
        out.update({"input1": im1, "input2": im2})
        return out


def _kitti_cls(use_2015, use_2012, dstype, photo_default, crop_default):
    class _C(KittiComb):
        def __init__(self, args=None, root=None,
                     photometric_augmentations=photo_default,
                     preprocessing_crop=crop_default, pad_multiple=64,
                     rng=None):
            kw = {}
            if use_2015:
                base = ("testing" if dstype == "test" else "training")
                kw["images_root_2015"] = os.path.join(root, "data_scene_flow", base, "image_2")
                if dstype != "test":
                    kw["flow_root_2015"] = os.path.join(root, "data_scene_flow", base, "flow_occ")
            if use_2012:
                base = ("testing" if dstype == "test" else "training")
                kw["images_root_2012"] = os.path.join(root, "data_stereo_flow", base, "colored_0")
                if dstype != "test":
                    kw["flow_root_2012"] = os.path.join(root, "data_stereo_flow", base, "flow_occ")
            super().__init__(args, photometric_augmentations=photometric_augmentations,
                             preprocessing_crop=preprocessing_crop,
                             pad_multiple=pad_multiple, dstype=dstype,
                             rng=rng, **kw)
    return _C


KittiCombTrain = _kitti_cls(True, True, "train", True, True)
KittiCombVal = _kitti_cls(True, True, "valid", False, False)
KittiCombFull = _kitti_cls(True, True, "full", True, True)
KittiComb2015Train = _kitti_cls(True, False, "train", True, True)
KittiComb2015Val = _kitti_cls(True, False, "valid", False, False)
KittiComb2015Full = _kitti_cls(True, False, "full", True, True)
KittiComb2015Test = _kitti_cls(True, False, "test", False, False)
KittiComb2012Train = _kitti_cls(False, True, "train", True, True)
KittiComb2012Val = _kitti_cls(False, True, "valid", False, False)
KittiComb2012Full = _kitti_cls(False, True, "full", True, True)
KittiComb2012Test = _kitti_cls(False, True, "test", False, False)
