"""Data pipeline tests: NIfTI IO roundtrip, supervision masks, atlas,
dataset geometry, augmentation, synthetic fixtures."""

import os

import numpy as np
import pytest

from multimodal_pl_tpu.data.atlas import generate_atlas, resize_atlas_nearest
from multimodal_pl_tpu.data.augment import intensity_augment, mask_aug
from multimodal_pl_tpu.data.dataset import (
    AMOSDataset,
    case_id_of,
    pad_to,
    split_files,
    truncate_intensity,
)
from multimodal_pl_tpu.data.nifti import read_nifti, write_nifti
from multimodal_pl_tpu.data.supervision import (
    generate_supervision_csv,
    load_supervision_csv,
    supervision_mask_for_case,
    supervision_mask_from_label,
)
from multimodal_pl_tpu.data.synthetic import make_synthetic_amos


class TestNifti:
    @pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
    @pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8])
    def test_roundtrip(self, tmp_path, rng, suffix, dtype):
        arr = (rng.random((5, 7, 9)) * 100).astype(dtype)
        p = str(tmp_path / f"x{suffix}")
        write_nifti(p, arr, spacing=(1.0, 1.0, 2.0))
        img = read_nifti(p)
        np.testing.assert_array_equal(img.data, arr)
        assert img.spacing == (1.0, 1.0, 2.0)

    def test_scl_scaling_applied(self, tmp_path, rng):
        # a file with slope 2 / inter 5 must be rescaled like nibabel get_fdata
        import struct

        arr = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
        p = str(tmp_path / "s.nii")
        write_nifti(p, arr)
        raw = bytearray(open(p, "rb").read())
        struct.pack_into("<f", raw, 112, 2.0)
        struct.pack_into("<f", raw, 116, 5.0)
        open(p, "wb").write(bytes(raw))
        img = read_nifti(p)
        np.testing.assert_allclose(img.data, arr * 2.0 + 5.0)


class TestSupervision:
    def test_ct_single_organ(self):
        m = supervision_mask_for_case(1)
        # [0]=0: background carries no loss weight (reference csv slot 0 is 0
        # in every row and feeds get_loss directly as the class weights)
        assert m[0] == 0 and m.sum() == 1  # exactly one organ

    def test_mri_no_organs(self):
        m = supervision_mask_for_case(503)
        assert m[0] == 0 and m.sum() == 0  # all-zero row like the reference

    def test_csv_roundtrip(self, tmp_path):
        p = str(tmp_path / "sup.csv")
        generate_supervision_csv([1, 50, 503], p)
        d = load_supervision_csv(p)
        assert set(d) == {"amos_0001", "amos_0050", "amos_0503"}
        np.testing.assert_array_equal(d["amos_0001"], supervision_mask_for_case(1))

    def test_from_label(self):
        lab = np.zeros((4, 4, 4), np.int32)
        lab[0, 0, 0] = 3
        lab[1, 1, 1] = 7
        m = supervision_mask_from_label(lab)
        assert m[3] == 1 and m[7] == 1 and m.sum() == 2


class TestAtlasResize:
    def test_matches_torch_nearest(self, rng):
        import torch
        import torch.nn.functional as F

        atlas = rng.random((3, 6, 8, 10)).astype(np.float32)
        got = resize_atlas_nearest(atlas, (9, 5, 13))
        want = F.interpolate(torch.from_numpy(atlas).unsqueeze(0), (9, 5, 13)).numpy()[0]
        np.testing.assert_array_equal(got, want)


class TestDatasetGeometry:
    def test_case_id(self):
        assert case_id_of("/x/imagesTr/amos_0007_0000.nii.gz") == 7
        assert case_id_of("amos_0533.nii.gz") == 533

    def test_truncate_ct(self):
        v = np.array([-1000.0, 0.0, 500.0])
        np.testing.assert_allclose(truncate_intensity(v, 3), [-1.0, 0.0, 1.0])

    def test_truncate_mri_zscore(self, rng):
        v = rng.random((10, 10)).astype(np.float32) * 50
        out = truncate_intensity(v, 520)
        np.testing.assert_allclose(out.mean(), 0, atol=1e-5)
        np.testing.assert_allclose(out.std(), 1, atol=1e-4)

    def test_truncate_mri_constant_volume_no_nan(self):
        # std == 0: the reference would emit NaN (MOTSDataset.py:171-186);
        # the guarded divide must return finite zeros instead.
        v = np.full((8, 8, 8), 42.0, np.float32)
        out = truncate_intensity(v, 520)
        assert np.all(np.isfinite(out))
        np.testing.assert_allclose(out, 0.0)

    def test_pad_to(self):
        v = np.zeros((3, 4, 5))
        assert pad_to(v, (6, 4, 7)).shape == (6, 4, 7)
        assert pad_to(v, (2, 2, 2)).shape == (3, 4, 5)  # never shrinks

    def test_split_deterministic(self):
        files = [f"f{i}" for i in range(10)]
        a = split_files(files, "train")
        b = split_files(files, "train")
        assert a == b and len(a) == 7
        assert len(split_files(files, "valid")) == 1
        assert len(split_files(files, "test")) == 2
        # splits are disjoint and cover everything
        assert set(a) | set(split_files(files, "valid")) | set(split_files(files, "test")) == set(files)


class TestAugment:
    def test_mask_aug(self, rng):
        m = rng.random((2, 1, 4, 4, 4))
        out = mask_aug(m, 2)
        assert out.shape == (4, 1, 4, 4, 4)
        np.testing.assert_array_equal(out[0], m[0])
        np.testing.assert_array_equal(out[1], m[0])
        np.testing.assert_array_equal(out[2], m[1])

    def test_intensity_augment_shape_and_determinism(self, rng):
        x = rng.standard_normal((8, 8, 8, 8, 1)).astype(np.float32)
        a = intensity_augment(x, np.random.default_rng(7))
        b = intensity_augment(x, np.random.default_rng(7))
        assert a.shape == x.shape
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, x)  # p(no aug across 8 samples) ~ 0.45^8
        # original untouched
        assert np.isfinite(a).all()


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("amos"))
    make_synthetic_amos(root, n_ct=4, n_mri=2, shape=(48, 48, 40), seed=0, spread_ids=False)
    return root


class TestEndToEndDataset:
    def test_fixture_layout(self, synthetic_root):
        assert os.path.exists(os.path.join(synthetic_root, "imagesTr", "amos_0001_0000.nii.gz"))
        assert os.path.exists(os.path.join(synthetic_root, "labelsTr", "amos_0500.nii.gz"))
        atlas = np.load(os.path.join(synthetic_root, "atlas_mm.npy"))
        assert atlas.shape[0] == 13 and atlas.max() > 0

    def test_train_sample(self, synthetic_root):
        atlas = np.load(os.path.join(synthetic_root, "atlas_mm.npy"))
        ds = AMOSDataset(
            os.path.join(synthetic_root, "imagesTr"),
            crop_size=(16, 32, 32), usage="train", atlas=atlas,
            supervision_csv=os.path.join(synthetic_root, "supervise_mask.csv"),
        )
        assert len(ds) >= 1
        s = ds[0]
        assert s.image.shape == (16, 32, 32, 1)
        assert s.label.shape == (16, 32, 32)
        assert s.catlas.shape == (13, 16, 32, 32)
        # [0]=0: background carries no loss weight (reference csv slot 0)
        assert s.sup_mask.shape == (14,) and s.sup_mask[0] == 0
        assert s.label_t.shape == (13,)
        assert np.isfinite(s.image).all()

    def test_valid_sample_fullsize(self, synthetic_root):
        atlas = np.load(os.path.join(synthetic_root, "atlas_mm.npy"))
        ds = AMOSDataset(
            os.path.join(synthetic_root, "imagesTr"),
            crop_size=(16, 32, 32), usage="valid", atlas=atlas,
        )
        if len(ds) == 0:
            pytest.skip("tiny fixture set has no valid-split file")
        s = ds[0]
        # full volume (padded to >= crop+5), not cropped
        assert s.image.shape[0] >= 16

    def test_batches_iterator(self, synthetic_root):
        atlas = np.load(os.path.join(synthetic_root, "atlas_mm.npy"))
        ds = AMOSDataset(
            os.path.join(synthetic_root, "imagesTr"),
            crop_size=(16, 32, 32), usage="train", atlas=atlas,
        )
        batches = list(ds.batches(batch_size=1, epochs=1, prefetch=1))
        assert len(batches) == len(ds)
        b = batches[0]
        assert b["image"].shape == (1, 16, 32, 32, 1)
        assert b["catlas"].shape == (13, 16, 32, 32)
        assert "image_r" in b and b["image_r"].shape == b["image"].shape

    def test_atlas_generation_from_fixtures(self, synthetic_root, tmp_path):
        out = str(tmp_path / "atlas2.npy")
        atlas = generate_atlas(os.path.join(synthetic_root, "labelsTr"), out)
        assert atlas.shape[0] == 13
        assert os.path.exists(out)
        assert 0 <= atlas.min() and atlas.max() <= 1.0 + 1e-5


class TestMOTSHelpers:
    def test_id2trainid_task2(self):
        from multimodal_pl_tpu.data.dataset import id2trainId

        lab = np.array([[[0, 1], [2, 1]]])
        out = id2trainId(lab, 2)
        np.testing.assert_array_equal(out[0], (lab == 1).astype(np.float32))
        np.testing.assert_array_equal(out[1], (lab == 2).astype(np.float32))

    def test_id2trainid_missing_channel(self):
        from multimodal_pl_tpu.data.dataset import id2trainId

        lab = np.ones((2, 2, 2), np.int32)
        out = id2trainId(lab, 6)  # task 6: organ only
        assert (out[1] == -1).all()

    def test_locate_bbx_in_bounds(self, rng):
        from multimodal_pl_tpu.data.dataset import locate_bbx

        label = np.zeros((64, 64, 64), np.int32)
        label[20:40, 25:45, 30:50] = 1
        for _ in range(5):
            box = locate_bbx(label, (16, 16, 16), 1.0, np.random.default_rng(0))
            for (a, b), s in zip(box, label.shape):
                assert 0 <= a and b <= s and b - a == 16

    def test_mirror_scale_options(self, synthetic_root):
        atlas = np.load(os.path.join(synthetic_root, "atlas_mm.npy"))
        ds = AMOSDataset(os.path.join(synthetic_root, "imagesTr"),
                         crop_size=(16, 32, 32), usage="train", atlas=atlas,
                         mirror=True, scale=True, seed=3)
        s = ds[0]
        assert s.image.shape == (16, 32, 32, 1)
        assert np.isfinite(s.image).all()


class TestPreprocess:
    def test_reorient_identity_ras(self, rng):
        from multimodal_pl_tpu.data.preprocess import reorient_to_ras

        data = rng.random((4, 5, 6)).astype(np.float32)  # (Z, Y, X)
        affine = np.diag([1.0, 1.0, 2.0, 1.0]).astype(np.float32)
        out, spacing = reorient_to_ras(data, affine)
        np.testing.assert_array_equal(out, data)
        np.testing.assert_allclose(spacing, (1, 1, 2))

    def test_reorient_flipped_axis(self, rng):
        from multimodal_pl_tpu.data.preprocess import reorient_to_ras

        data = rng.random((4, 5, 6)).astype(np.float32)
        # x axis stored right-to-left (LAS): flip of world-x
        affine = np.diag([-1.0, 1.0, 2.0, 1.0]).astype(np.float32)
        out, _ = reorient_to_ras(data, affine)
        np.testing.assert_array_equal(out, data[:, :, ::-1])

    def test_reorient_permuted_axes(self, rng):
        from multimodal_pl_tpu.data.preprocess import reorient_to_ras

        data = rng.random((4, 5, 6)).astype(np.float32)
        # index axes (i,j,k) map to world (y,x,z): swap x and y
        affine = np.zeros((4, 4), np.float32)
        affine[1, 0] = 1.0  # i -> +y
        affine[0, 1] = 1.0  # j -> +x
        affine[2, 2] = 2.0  # k -> +z
        affine[3, 3] = 1.0
        out, spacing = reorient_to_ras(data, affine)
        # xyz view: transpose(data,(2,1,0)) has axes (i,j,k)=(y,x,z) world;
        # RAS wants (x,y,z) -> swap first two -> back to (Z,Y,X) index order
        want = np.transpose(np.transpose(data, (2, 1, 0)), (1, 0, 2))
        want = np.transpose(want, (2, 1, 0))
        np.testing.assert_array_equal(out, want)
        np.testing.assert_allclose(spacing, (1, 1, 2))

    def test_body_mask_crop(self, rng):
        from multimodal_pl_tpu.data.preprocess import get_body

        vol = np.full((20, 20, 20), -1000.0, np.float32)
        vol[4:16, 4:16, 4:16] = 100.0  # "body"
        body = get_body(vol, threshold=-200, min_voxels=10)
        assert body is not None and body.sum() > 0
        zz = np.nonzero(body)[0]
        assert 3 <= zz.min() and zz.max() <= 16


def test_dataset_cache_parity(synthetic_root):
    """cache=True returns bit-identical samples and never mutates the memo."""
    import numpy as np
    from multimodal_pl_tpu.data.dataset import AMOSDataset

    atlas = np.load(os.path.join(synthetic_root, "atlas_mm.npy"))
    kw = dict(crop_size=(16, 24, 24), usage="train", atlas=atlas, seed=7)
    ds_plain = AMOSDataset(os.path.join(synthetic_root, "imagesTr"), **kw)
    ds_cache = AMOSDataset(os.path.join(synthetic_root, "imagesTr"), cache=True, **kw)
    for _ in range(2):  # second pass hits the memo; same rng stream both sides
        for i in range(len(ds_plain)):
            a, b = ds_plain[i], ds_cache[i]
            np.testing.assert_array_equal(a.image, b.image)
            np.testing.assert_array_equal(a.label, b.label)
            np.testing.assert_array_equal(a.catlas, b.catlas)
            np.testing.assert_array_equal(a.sup_mask, b.sup_mask)
