"""Device-resident data pipeline (data/device_cache.py) vs the host path.

The pipeline must produce the same batch CONTENT as AMOSDataset.batches for
matched draws: identical crops/labels/catlas with augs off, and the intensity
recipe applied on device must match the numpy recipe for fixed parameters
(the only intended deviations: the noise RNG stream and the blur kernel's
fixed radius — see the module docstring)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter

from multimodal_pl_tpu.data.dataset import AMOSDataset
from multimodal_pl_tpu.data.device_cache import (
    DeviceDataPipeline,
    _AUG_KEYS,
    draw_aug_params,
    intensity_augment_device,
)
from multimodal_pl_tpu.data.synthetic import make_synthetic_amos


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    r = str(tmp_path_factory.mktemp("amos_dev"))
    make_synthetic_amos(r, n_ct=4, n_mri=2, shape=(48, 48, 40), seed=0,
                        spread_ids=False)
    return r


@pytest.fixture(scope="module")
def ds(root):
    import os

    atlas = np.load(os.path.join(root, "atlas_mm.npy"))
    return AMOSDataset(os.path.join(root, "imagesTr"), crop_size=(24, 32, 32),
                       usage="train", atlas=atlas, cache=True)


class TestBatchParity:
    def test_crop_content_matches_host(self, ds):
        """Same case + same crop corner -> identical image/label/catlas."""
        pipe = DeviceDataPipeline(ds, compute_dtype=jnp.float32, augment=False)
        # draw a host sample with a known crop by pinning the dataset rng
        ds.rng = np.random.default_rng(123)
        s = ds[0]
        # recover the host's crop corner from its rng stream (same draw order)
        hh, ww, dd = ds._prepared(0)[1].shape   # prepared (H, W, D)
        r = np.random.default_rng(123)
        b = int(r.integers(0, hh - ds.crop_h))
        c = int(r.integers(0, ww - ds.crop_w))
        a = int(r.integers(0, dd - ds.crop_d))
        batch = pipe._make_batch(
            pipe.images, pipe.labels, pipe.catlas, pipe.sup, pipe.lt,
            jnp.asarray([0], jnp.int32), jnp.asarray([[a, b, c]], jnp.int32),
            jnp.zeros((1, 3), jnp.float32),
            {k: jnp.zeros(1, jnp.float32) for k in _AUG_KEYS},
            jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(batch["image"][0]), s.image,
                                   rtol=0, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(batch["label"][0]), s.label)
        np.testing.assert_allclose(np.asarray(batch["catlas"]), s.catlas,
                                   rtol=0, atol=1e-6)
        assert np.array_equal(np.asarray(batch["sup_mask"]), s.sup_mask)
        assert np.array_equal(np.asarray(batch["label_t"]), s.label_t)

    def test_batches_iterator_shapes(self, ds):
        pipe = DeviceDataPipeline(ds, compute_dtype=jnp.bfloat16, augment=True)
        n = 0
        for b in pipe.batches(2, epochs=2):
            assert b["image"].shape == (2, 24, 32, 32, 1)
            assert b["image"].dtype == jnp.bfloat16
            assert b["label"].shape == (2, 24, 32, 32)
            assert b["catlas"].shape == (13, 24, 32, 32)
            n += 1
        assert n == 2 * (len(ds) // 2)

    def test_mesh_global_batch_matches_per_shard(self, ds):
        """Mesh mode (data:4): the shard_map'd global-batch program must
        equal 4 single-shard batches assembled with the SAME idxs/starts and
        stacked into the sharded-step layout (parallel.mesh.shard_batch) —
        augs off so the per-shard PRNG fold is irrelevant."""
        from multimodal_pl_tpu.parallel.mesh import make_mesh, shard_batch

        from tests.conftest import cpu_devices

        mesh = make_mesh("data:4", cpu_devices())
        pipe = DeviceDataPipeline(ds, compute_dtype=jnp.float32, augment=False,
                                  mesh=mesh)
        single = DeviceDataPipeline(ds, compute_dtype=jnp.float32, augment=False)
        assert pipe.n_shards == 4

        rng = np.random.default_rng(5)
        n = len(ds)
        idxs = rng.integers(0, n, 4).astype(np.int32)
        starts = single.draw_starts(4)
        zero_p = {k: jnp.zeros(1, jnp.float32) for k in _AUG_KEYS}
        key = jax.random.PRNGKey(0)

        img, lab, cat, sup, lt = pipe._make_global(
            pipe.images, pipe.labels, pipe.catlas, pipe.sup, pipe.lt,
            jnp.asarray(idxs.reshape(4, 1)), jnp.asarray(starts.reshape(4, 1, 3)),
            jnp.zeros((4, 1, 3), jnp.float32),
            {k: jnp.zeros((4, 1), jnp.float32) for k in _AUG_KEYS}, key)

        shards = []
        for s in range(4):
            b = single._make_batch(
                single.images, single.labels, single.catlas, single.sup,
                single.lt, jnp.asarray(idxs[s: s + 1]),
                jnp.asarray(starts[s: s + 1]), jnp.zeros((1, 3), jnp.float32),
                zero_p, key)
            shards.append({k: np.asarray(v) for k, v in b.items()})
        want = shard_batch(shards)

        np.testing.assert_allclose(np.asarray(img), want["image"], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(lab), want["label"])
        np.testing.assert_allclose(np.asarray(cat), want["catlas"], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(sup), want["sup_mask"])
        np.testing.assert_array_equal(np.asarray(lt), want["label_t"])

    def test_mesh_batches_iterator_layout(self, ds):
        """batches() in mesh mode yields sharded-step global batches and
        consumes n_shards * batch_size samples per step."""
        from multimodal_pl_tpu.parallel.mesh import make_mesh

        from tests.conftest import cpu_devices

        mesh = make_mesh("data:2", cpu_devices())
        pipe = DeviceDataPipeline(ds, compute_dtype=jnp.bfloat16, mesh=mesh)
        n = 0
        for b in pipe.batches(1, epochs=2):
            assert b["image"].shape == (2, 24, 32, 32, 1)
            assert b["catlas"].shape == (2, 13, 24, 32, 32)
            assert b["sup_mask"].shape == (2, 14)
            assert b["label_t"].shape == (2, 13)
            n += 1
        assert n == 2 * (len(ds) // 2)

    def test_nonuniform_shapes_rejected(self, ds):
        class Mixed:
            crop_d, crop_h, crop_w = ds.crop_d, ds.crop_h, ds.crop_w
            scale = False

            def __len__(self):
                return 2

            def _prepared(self, i):
                shp = (48, 48, 40) if i == 0 else (56, 48, 40)
                return (i, np.zeros(shp, np.float32),
                        np.zeros(shp, np.int32),
                        np.zeros((13, *shp), np.float32))

            def _sup_mask(self, cid):
                return np.ones(14, np.float32)

        with pytest.raises(ValueError, match="uniform"):
            DeviceDataPipeline(Mixed())


class TestIntensityTwin:
    """Device intensity recipe vs the numpy recipe at FIXED parameters."""

    def _apply_numpy(self, x, p):
        """data/augment.intensity_augment's math for given params (no rng)."""
        x = x.copy()
        if p["blur_on"]:
            x = gaussian_filter(x, p["blur_sig"])
        if p["bm_on"]:
            x = x * p["bm_f"]
        if p["ba_on"]:
            x = x + p["ba_sh"]
        if p["ct_on"]:
            mn, mx, mean = x.min(), x.max(), x.mean()
            x = np.clip((x - mean) * p["ct_f"] + mean, mn, mx)
        return x

    @pytest.mark.parametrize("cfg", [
        dict(blur_on=1.0, blur_sig=0.8),
        dict(bm_on=1.0, bm_f=1.2),
        dict(ba_on=1.0, ba_sh=-0.07),
        dict(ct_on=1.0, ct_f=0.8),
        dict(blur_on=1.0, blur_sig=0.55, bm_on=1.0, bm_f=0.9, ct_on=1.0,
             ct_f=1.2),
    ])
    def test_fixed_params_match_numpy(self, cfg):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(12, 16, 16)).astype(np.float32)
        p = {k: np.float32(0.0) for k in _AUG_KEYS}
        p["blur_sig"] = np.float32(0.75)
        p["bm_f"] = np.float32(1.0)
        p["ct_f"] = np.float32(1.0)
        p.update({k: np.float32(v) for k, v in cfg.items()})
        got = np.asarray(intensity_augment_device(
            jnp.asarray(x), {k: jnp.asarray(v) for k, v in p.items()},
            jax.random.PRNGKey(0)))
        want = self._apply_numpy(x, p)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_noise_statistics(self):
        x = np.zeros((16, 16, 16), np.float32)
        p = {k: jnp.asarray(np.float32(0.0)) for k in _AUG_KEYS}
        p["noise_on"] = jnp.asarray(np.float32(1.0))
        p["noise_std"] = jnp.asarray(np.float32(0.2))
        p["blur_sig"] = jnp.asarray(np.float32(0.75))
        p["bm_f"] = jnp.asarray(np.float32(1.0))
        p["ct_f"] = jnp.asarray(np.float32(1.0))
        got = np.asarray(intensity_augment_device(jnp.asarray(x), p,
                                                  jax.random.PRNGKey(7)))
        assert abs(got.std() - 0.2) < 0.02
        assert abs(got.mean()) < 0.02

    def test_param_distribution_control_flow(self):
        """draw_aug_params consumes the rng with the documented probabilities."""
        rng = np.random.default_rng(0)
        p = draw_aug_params(rng, 4000)
        assert abs(p["noise_on"].mean() - 0.1) < 0.02
        assert abs(p["blur_on"].mean() - 0.1) < 0.02      # 0.2 * 0.5
        assert abs(p["bm_on"].mean() - 0.15) < 0.02
        assert abs(p["ct_on"].mean() - 0.15) < 0.02
        on = p["blur_sig"][p["blur_on"] > 0]
        assert on.min() >= 0.5 and on.max() <= 1.0
