"""Shape / gradient / channel-plan tests for the model zoo.

The channel plan follows the reference comments (unet3D.py:1120-1183):
for input (B, 64, 192, 192, 1) the decoder runs 256@(4,12,12) -> 128@(8,24,24)
-> 64@(16,48,48) -> 32@(32,96,96) -> 32@(64,192,192). Tests use a 16x scale-down
spatial size (16, 32, 32) to keep single-vCPU compile times sane.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_pl_tpu.models import (
    DeepStyleDiscriminator,
    NormStyleDiscriminator,
    RefinerUNet3D,
    UNet3DBaseline,
    UNet3DDeepSup,
    UNet3DDynHead,
    UNet3DEAM,
    UNet3DFEAM,
    init_class_tokens,
    renew_tokens,
)

D, H, W = 16, 32, 32
NC = 14


@pytest.fixture(scope="module")
def feam():
    model = UNet3DFEAM(num_classes=NC, weight_std=True, deep_up=False)
    tokens = init_class_tokens(jax.random.PRNGKey(1), NC)
    x = jnp.zeros((1, D, H, W, 1))
    params = model.init(jax.random.PRNGKey(0), x, tokens)
    return model, params, tokens


class TestFEAM:
    def test_shapes(self, feam):
        model, params, tokens = feam
        x = jnp.ones((1, D, H, W, 1))
        logits, attns, deeps, feats, new_tokens = model.apply(params, x, tokens)
        assert logits.shape == (1, D, H, W, NC)
        assert [a.shape for a in attns] == [
            (1, D // 8, H // 8, W // 8, NC - 1),
            (1, D // 4, H // 4, W // 4, NC - 1),
            (1, D // 2, H // 2, W // 2, NC - 1),
        ]
        assert [d.shape for d in deeps] == [
            (1, D // 8, H // 8, W // 8, NC),
            (1, D // 4, H // 4, W // 4, NC),
            (1, D // 2, H // 2, W // 2, NC),
        ]
        assert [f.shape[-1] for f in feats] == [128, 64, 32]
        # post mode must not touch tokens
        for k in tokens:
            np.testing.assert_array_equal(np.asarray(new_tokens[k]), np.asarray(tokens[k]))

    def test_deep_up_upsamples_attn(self, feam):
        _, params, tokens = feam
        model_up = UNet3DFEAM(num_classes=NC, weight_std=True, deep_up=True)
        x = jnp.ones((1, D, H, W, 1))
        _, attns, _, _, _ = model_up.apply(params, x, tokens)
        assert all(a.shape == (1, D, H, W, NC - 1) for a in attns)

    def test_grads_flow(self, feam):
        model, params, tokens = feam
        x = jnp.ones((1, D, H, W, 1))

        def loss_fn(p):
            logits, attns, deeps, _, _ = model.apply(p, x, tokens)
            return (
                jnp.mean(logits**2)
                + sum(jnp.mean(a**2) for a in attns)
                + sum(jnp.mean(d**2) for d in deeps)
            )

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        # encoder and EAM weights both receive gradient
        flat = jax.tree_util.tree_flatten_with_path(g)[0]
        nonzero = {jax.tree_util.keystr(k) for k, v in flat if float(jnp.abs(v).sum()) > 0}
        assert any("encoder" in k for k in nonzero)
        assert any("eam84" in k for k in nonzero)

    def test_pre_token_update_changes_tokens(self, feam):
        _, params, tokens = feam
        model_pre = UNet3DFEAM(num_classes=NC, weight_std=True, token_update="pre")
        x = jnp.ones((1, D, H, W, 1))
        mask = jnp.zeros((1, D, H, W), jnp.int32).at[:, :4, :8, :8].set(3)
        _, _, _, _, new_tokens = model_pre.apply(params, x, tokens, mask)
        # class 3 token moved, others unchanged
        assert not np.allclose(np.asarray(new_tokens["t1"][2]), np.asarray(tokens["t1"][2]))
        np.testing.assert_array_equal(np.asarray(new_tokens["t1"][5]), np.asarray(tokens["t1"][5]))


class TestTokens:
    def test_renew_tokens_masked_mean(self):
        tokens = {"t1": jnp.zeros((13, 4))}
        feat = jnp.arange(1 * 2 * 2 * 2 * 4, dtype=jnp.float32).reshape(1, 2, 2, 2, 4)
        fmask = jnp.full((1, 4, 4, 4), 2, jnp.int32)  # class 2 everywhere
        new = renew_tokens(tokens, [feat], fmask, alpha=0.5)
        want_mean = np.asarray(feat).reshape(-1, 4).mean(0)
        np.testing.assert_allclose(np.asarray(new["t1"][1]), 0.5 * want_mean, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(new["t1"][0]), 0.0)

    def test_renew_tokens_empty_class_untouched(self):
        tokens = {"t1": jnp.ones((13, 4))}
        feat = jnp.ones((1, 2, 2, 2, 4))
        fmask = jnp.zeros((1, 4, 4, 4), jnp.int32)
        new = renew_tokens(tokens, [feat], fmask, alpha=0.5)
        np.testing.assert_array_equal(np.asarray(new["t1"]), np.ones((13, 4)))


class TestVariants:
    def test_refiner_shapes(self):
        # the refiner downsamples 32x (stride-2 stem + 4 encoder strides),
        # so spatial dims must be divisible by 32 (true for 64x192x192 patches)
        model = RefinerUNet3D()
        x = jnp.ones((3, 32, 32, 32, 2))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (3, 32, 32, 32, 2)

    def test_baseline(self):
        model = UNet3DBaseline(num_classes=NC)
        x = jnp.ones((1, D, H, W, 1))
        params = model.init(jax.random.PRNGKey(0), x)
        assert model.apply(params, x).shape == (1, D, H, W, NC)

    def test_deepsup(self):
        model = UNet3DDeepSup(num_classes=NC)
        x = jnp.ones((1, D, H, W, 1))
        params = model.init(jax.random.PRNGKey(0), x)
        logits, deeps = model.apply(params, x)
        assert logits.shape == (1, D, H, W, NC)
        assert len(deeps) == 3

    def test_eam_variant(self):
        model = UNet3DEAM(num_classes=NC)
        x = jnp.ones((1, D, H, W, 1))
        params = model.init(jax.random.PRNGKey(0), x)
        logits, cm, attns = model.apply(params, x)
        assert logits.shape == (1, D, H, W, NC)
        assert cm.shape == (1, NC, 32)
        assert len(attns) == 3

    def test_dynhead(self):
        model = UNet3DDynHead()
        x = jnp.ones((2, D, H, W, 1))
        tid = jnp.array([0, 3])
        params = model.init(jax.random.PRNGKey(0), x, tid)
        out = model.apply(params, x, tid)
        assert out.shape == (2, D, H, W, 2)


class TestDiscriminators:
    def test_norm_style(self):
        model = NormStyleDiscriminator()
        x = jnp.ones((5, 64, 64, 64, 2))
        params = model.init(jax.random.PRNGKey(0), x)
        assert model.apply(params, x).shape == (5, 2)

    def test_deep_style(self):
        model = DeepStyleDiscriminator()
        x = jnp.ones((5, 64, 96, 96, 2))
        attns = [
            jnp.ones((5, 8, 12, 12, 1)),
            jnp.ones((5, 16, 24, 24, 1)),
            jnp.ones((5, 32, 48, 48, 1)),
        ]
        params = model.init(jax.random.PRNGKey(0), x, attns)
        assert model.apply(params, x, attns).shape == (5, 2)
