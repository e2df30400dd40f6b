"""Smoke + behavior tests for auxiliary components: aux loss variants,
spatial transforms, engine shim, data lists, multisource filters, profiling."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_pl_tpu.data.lists import create_data_lists
from multimodal_pl_tpu.data.multisource import convert_seg_chaos, source_of
from multimodal_pl_tpu.data.transforms import (
    AugmentConfig,
    get_transforms,
    percentile_window,
    rand_spatial_crop,
    scale_intensity_range,
    spatial_augment,
)
from multimodal_pl_tpu.engine import Engine, extant_file
from multimodal_pl_tpu.losses.aux_variants import (
    segmentation_loss2,
    segmentation_loss_mse,
    segmentation_loss_multiref,
    segmentation_loss_semi,
)
from multimodal_pl_tpu.utils.profiling import StepTimer


class TestAuxLosses:
    @pytest.fixture()
    def inputs(self, rng):
        nc, D = 14, 8
        logits = jnp.asarray(rng.standard_normal((1, D, D, D, nc)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, nc, (1, D, D, D)))
        sup = jnp.asarray(np.eye(nc, dtype=np.float32)[3] + np.eye(nc, dtype=np.float32)[0])
        deeps = [jnp.asarray(rng.standard_normal((1, D // k, D // k, D // k, nc)).astype(np.float32))
                 for k in (8, 4, 2)]
        attns = [jnp.asarray(rng.standard_normal((1, D, D, D, nc - 1)).astype(np.float32))
                 for _ in range(3)]
        rlog = jnp.asarray(rng.standard_normal((nc - 1, D, D, D, 2)).astype(np.float32))
        label_t = jnp.asarray(np.array([0, 0, 0, 0, 1, 1, 1, 1, 1, 0, 1, 1, 1], np.float32))
        return logits, labels, sup, deeps, attns, rlog, label_t

    @pytest.mark.parametrize("fn", [segmentation_loss_mse, segmentation_loss2,
                                    segmentation_loss_multiref, segmentation_loss_semi])
    def test_finite_and_positive(self, inputs, fn):
        logits, labels, sup, deeps, attns, rlog, label_t = inputs
        v = float(fn(logits, labels, sup, deeps, attns, rlog, label_t))
        assert np.isfinite(v) and v > 0

    @pytest.mark.parametrize("fn", [segmentation_loss_mse, segmentation_loss2,
                                    segmentation_loss_multiref, segmentation_loss_semi])
    def test_no_refiner_branch(self, inputs, fn):
        logits, labels, sup, deeps, attns, _, label_t = inputs
        v = float(fn(logits, labels, sup, deeps, attns, None, label_t))
        assert np.isfinite(v)

    def test_grads_flow(self, inputs):
        logits, labels, sup, deeps, attns, rlog, label_t = inputs
        g = jax.grad(lambda l: segmentation_loss2(l, labels, sup, deeps, attns, rlog, label_t))(
            logits)
        assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


class TestTransforms:
    def test_scale_intensity(self):
        x = np.array([-100.0, 0.0, 100.0])
        np.testing.assert_allclose(scale_intensity_range(x, -100, 100), [0, 0.5, 1.0])

    def test_percentile_window_range(self, rng):
        x = rng.standard_normal((20, 20, 20)).astype(np.float32) * 50
        out = percentile_window(x)
        assert out.min() >= 0 and out.max() <= 1

    def test_spatial_augment_label_integrity(self, rng):
        img = rng.standard_normal((16, 16, 16)).astype(np.float32)
        lab = (rng.random((16, 16, 16)) > 0.8).astype(np.int32) * 3
        cfg = AugmentConfig(p_rotate=1.0, p_zoom=1.0, p_translate=1.0, p_shear=1.0, p_flip=0.5)
        img2, lab2 = spatial_augment(img, lab, np.random.default_rng(0), cfg)
        assert img2.shape == img.shape
        assert set(np.unique(lab2)).issubset({0, 3})  # nearest keeps label values

    def test_rand_crop(self, rng):
        img = rng.standard_normal((16, 20, 24)).astype(np.float32)
        lab = np.zeros_like(img, dtype=np.int32)
        i2, l2 = rand_spatial_crop(img, lab, (8, 8, 8), np.random.default_rng(0))
        assert i2.shape == (8, 8, 8) and l2.shape == (8, 8, 8)

    def test_get_transforms_splits(self, rng):
        cfg = AugmentConfig(patch_size=(8, 8, 8))
        img = rng.standard_normal((16, 16, 16)).astype(np.float32)
        lab = rng.integers(0, 3, (16, 16, 16))
        for split in ("train", "val", "test"):
            f = get_transforms(split, cfg)
            i2, l2 = f(img, lab)
            assert i2.shape == (8, 8, 8)
        with pytest.raises(ValueError):
            get_transforms("bogus", cfg)


class TestEngineShim:
    def test_context_and_reduce(self):
        with Engine() as e:
            assert e.world_size >= 1
            v = float(e.all_reduce_tensor(jnp.asarray([2.0, 4.0])))
            assert v == 3.0

    def test_extant_file(self, tmp_path):
        p = tmp_path / "x.txt"
        p.write_text("hi")
        assert extant_file(str(p)) == str(p)
        import argparse

        with pytest.raises(argparse.ArgumentTypeError):
            extant_file(str(tmp_path / "missing"))


class TestListsAndSources:
    def test_create_data_lists(self, tmp_path):
        os.makedirs(tmp_path / "imagesTr")
        os.makedirs(tmp_path / "imagesTs")
        (tmp_path / "imagesTr" / "amos_0001_0000.nii.gz").write_bytes(b"")
        (tmp_path / "imagesTs" / "amos_0100_0000.nii.gz").write_bytes(b"")
        tr, te = create_data_lists(str(tmp_path), str(tmp_path / "list"))
        assert len(open(tr).readlines()) == 1
        assert len(open(te).readlines()) == 1

    def test_source_of(self):
        assert source_of("x/amos_0001_0000.nii.gz") == "amos_ct"
        assert source_of("x/amos_0533_0000.nii.gz") == "amos_mri"
        assert source_of("x/CHAOS_12.nii.gz") == "chaos"
        assert source_of("x/img0003.nii.gz") == "msd"

    def test_chaos_convert(self):
        lab = np.array([0, 1, 1, 0])
        np.testing.assert_array_equal(convert_seg_chaos(lab), [0, 5, 5, 0])

    def test_atlas_cores_weighted(self):
        """MOTSDataset.py:504-519 torch-golden: probability-weighted center
        of mass per channel, truncated to int; empty channel -> (0,0,0)."""
        from multimodal_pl_tpu.data.atlas import atlas_cores_weighted

        atlas = np.zeros((2, 4, 5, 6), np.float32)
        atlas[0, 1, 2, 3] = 0.2
        atlas[0, 3, 4, 5] = 0.6
        # weighted mean: d=(1*.2+3*.6)/.8=2.5->2, h=(2*.2+4*.6)/.8=3.5->3,
        # w=(3*.2+5*.6)/.8=4.5->4
        cores = atlas_cores_weighted(atlas)
        np.testing.assert_array_equal(cores[0], [2, 3, 4])
        np.testing.assert_array_equal(cores[1], [0, 0, 0])

        import torch
        cgan = torch.tensor(atlas[0])
        mesh = torch.meshgrid(*[torch.arange(s) for s in cgan.shape], indexing="ij")
        want = [int(((mesh[d][cgan > 0] * cgan[cgan > 0].float()).sum()
                     / cgan.sum()).int()) for d in range(3)]
        np.testing.assert_array_equal(cores[0], want)


def test_step_timer():
    t = StepTimer(window=2)
    for _ in range(3):
        t.start()
        t.stop(jnp.ones(3))
    assert len(t.times) == 2
    assert t.mean > 0 and t.rate(4.0) > 0


class TestConfig:
    def test_default_preprocessing_config(self):
        from multimodal_pl_tpu.data.config import get_config

        cfg = get_config("preprocessing_amos", config_dir="/nonexistent")
        assert cfg["orientation"] == "RAS"
        assert cfg["target_spacing"] == [1, 1, 2]

    def test_yaml_roundtrip(self, tmp_path):
        import yaml

        from multimodal_pl_tpu.data.config import augment_config_from_yaml, get_config

        doc = {"augmentation": {"p_rotate": 0.5, "rotation": [-5, 5],
                                "translate_precentage": 10, "flip_axis": [0, 1, 2],
                                "patch_size": [8, 8, 8]}}
        p = tmp_path / "cfg.yaml"
        p.write_text(yaml.safe_dump(doc))
        cfg = get_config(str(p))
        aug = augment_config_from_yaml(cfg)
        assert aug.p_rotate == 0.5
        assert aug.rotation == (-5, 5)
        assert aug.translate_percentage == 10
        assert aug.patch_size == (8, 8, 8)

    def test_amos_label_map(self):
        from multimodal_pl_tpu.data.config import AMOS_LABELS

        assert AMOS_LABELS[6] == "liver" and len(AMOS_LABELS) == 14


def test_import_every_module():
    """Every module imports cleanly (catches syntax/import rot)."""
    import importlib
    import pkgutil

    import multimodal_pl_tpu

    failures = []
    for m in pkgutil.walk_packages(multimodal_pl_tpu.__path__, "multimodal_pl_tpu."):
        try:
            importlib.import_module(m.name)
        except Exception as e:
            failures.append((m.name, repr(e)))
    assert not failures, failures
