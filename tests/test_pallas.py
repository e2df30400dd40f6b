"""Pallas kernel correctness in interpret mode (CPU) vs the XLA reference ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_pl_tpu.ops.norm import group_norm
from multimodal_pl_tpu.ops.pallas.fused_gn_relu import fused_group_norm_relu


@pytest.mark.parametrize("shape,groups", [((2, 4, 8, 8, 32), 16), ((1, 3, 5, 7, 24), 4)])
def test_fused_gn_relu_matches_reference(rng, shape, groups):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    c = shape[-1]
    scale = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    got = fused_group_norm_relu(x, scale, bias, groups, block_spatial=64, interpret=True)
    want = jax.nn.relu(group_norm(x, scale, bias, groups))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_fused_gn_relu_blocking_invariance(rng):
    """Different spatial block sizes must give identical results (incl. the
    zero-padded remainder path)."""
    x = jnp.asarray(rng.standard_normal((1, 3, 7, 5, 16)).astype(np.float32))
    scale = jnp.ones(16)
    bias = jnp.zeros(16)
    a = fused_group_norm_relu(x, scale, bias, 16, block_spatial=32, interpret=True)
    b = fused_group_norm_relu(x, scale, bias, 16, block_spatial=128, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_model_with_pallas_gn_flag_matches(rng):
    """set_fused_gn_relu routes every voxel-domain GN->ReLU pre-activation
    through the kernel (interpret mode off-TPU): forward AND gradients of a
    real block stack must match the flag-off path (the custom VJP recomputes
    the standard formula)."""
    from multimodal_pl_tpu.models.blocks import ResStage
    from multimodal_pl_tpu.ops.norm import set_fused_gn_relu

    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 32)).astype(np.float32))
    model = ResStage(features=64, blocks=1, stride=2, weight_std=True)
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(p, x):
        return jnp.sum(model.apply(p, x) ** 2)

    want, wgrads = jax.value_and_grad(loss)(params, x)
    try:
        set_fused_gn_relu(True)
        got, ggrads = jax.value_and_grad(loss)(params, x)
    finally:
        set_fused_gn_relu(False)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    # grads compare by relative Frobenius norm: the kernel's one-pass
    # variance rounds differently from XLA's two-pass, flipping the relu
    # mask on the ~0.2% of voxels sitting exactly at the threshold — an
    # elementwise comparison is ill-posed there, the aggregate is tight
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_flatten_with_path(wgrads)[0],
        jax.tree_util.tree_flatten_with_path(ggrads)[0],
    ):
        a, b = np.asarray(la), np.asarray(lb)
        rel = np.linalg.norm(b - a) / max(np.linalg.norm(a), 1e-12)
        assert rel < 5e-4, f"{jax.tree_util.keystr(pa)}: rel grad norm {rel:.2e}"


class TestK2Conv:
    """Pallas fused-gather k2 block conv (ops/pallas/k2_conv.py) vs XLA
    conv_general, interpret mode."""

    def _patched(self):
        import functools
        from jax.experimental import pallas as pl
        return functools.partial(pl.pallas_call, interpret=True)

    def test_forward_matches_conv(self, rng, monkeypatch):
        from jax.experimental import pallas as pl
        import multimodal_pl_tpu.ops.pallas.k2_conv as K
        monkeypatch.setattr(pl, "pallas_call", self._patched())

        x = jnp.asarray(rng.standard_normal((2, 4, 17, 17, 16)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((2, 2, 2, 16, 24)).astype(np.float32))
        for pad in (0, 1):
            got = K.k2_conv(x, w, pad=pad)
            xp = jnp.pad(x, [(0, 0)] + [(pad, pad)] * 3 + [(0, 0)]) if pad else x
            want = K._k2_valid_xla(xp, w)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-4)

    def test_gradients_match_conv(self, rng, monkeypatch):
        from jax.experimental import pallas as pl
        import multimodal_pl_tpu.ops.pallas.k2_conv as K
        monkeypatch.setattr(pl, "pallas_call", self._patched())

        x = jnp.asarray(rng.standard_normal((1, 3, 17, 17, 8)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((2, 2, 2, 8, 8)).astype(np.float32))

        def loss_pallas(x, w):
            return jnp.sum(K.k2_conv(x, w, pad=1) ** 2)

        def loss_xla(x, w):
            xp = jnp.pad(x, [(0, 0)] + [(1, 1)] * 3 + [(0, 0)])
            return jnp.sum(K._k2_valid_xla(xp, w) ** 2)

        ga = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
        gb = jax.grad(loss_xla, argnums=(0, 1))(x, w)
        for a, b, nm in [(ga[0], gb[0], "dx"), (ga[1], gb[1], "dw")]:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4, err_msg=nm)

    def test_s2d_conv3x3_flag_routes_through_kernel(self, rng):
        """set_k2_pallas makes s2d_conv3x3(stride=1) use the Pallas kernel
        (interpret mode off-TPU): forward and gradients must match the
        conv_general lowering for both packings."""
        from multimodal_pl_tpu.ops import s2d

        xb = jnp.asarray(rng.standard_normal((1, 4, 9, 9, 24)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 5)).astype(np.float32))
        for packing in ("a", "s"):
            def loss(xb, w):
                return jnp.sum(s2d.s2d_conv3x3(xb, w, packing) ** 2)

            want, wg = jax.value_and_grad(loss, argnums=(0, 1))(xb, w)
            try:
                s2d.set_k2_pallas(True)
                got, gg = jax.value_and_grad(loss, argnums=(0, 1))(xb, w)
            finally:
                s2d.set_k2_pallas(False)
            np.testing.assert_allclose(float(got), float(want), rtol=1e-4,
                                       err_msg=packing)
            for a, b, nm in [(wg[0], gg[0], "dx"), (wg[1], gg[1], "dw")]:
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-3, atol=1e-3,
                                           err_msg=f"{packing}:{nm}")

    def test_tiny_shapes_fall_back(self, rng):
        import multimodal_pl_tpu.ops.pallas.k2_conv as K
        x = jnp.asarray(rng.standard_normal((1, 3, 5, 5, 8)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((2, 2, 2, 8, 8)).astype(np.float32))
        got = K.k2_conv(x, w, pad=0)  # wo < 8 -> XLA path, no pallas
        want = K._k2_valid_xla(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)

    def test_forward_128lane_exercises_kernel(self, rng):
        """128-aligned channels actually enter the Pallas kernel (the sub-128
        shapes above take the XLA fallback by the k%128 contract check)."""
        import multimodal_pl_tpu.ops.pallas.k2_conv as K
        x = jnp.asarray(rng.standard_normal((1, 2, 9, 9, 128)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((2, 2, 2, 128, 128)).astype(np.float32) * 0.1)
        for pad in (0, 1):
            got = K.k2_conv(x, w, pad=pad)
            xp = jnp.pad(x, [(0, 0)] + [(pad, pad)] * 3 + [(0, 0)]) if pad else x
            want = K._k2_valid_xla(xp, w)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-3, atol=1e-3, err_msg=f"pad={pad}")


class TestFusedGNK2Conv:
    """Fused GN->ReLU->k2 conv (k2_gn_conv / s2d_gn_relu_conv3x3) vs the
    unfused composition, interpret mode, kernel-exercising 128-lane shapes."""

    def _xb(self, rng, shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    def test_fused_matches_unfused_both_packings(self, rng):
        from multimodal_pl_tpu.ops import s2d

        w = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 16)).astype(np.float32) * 0.2)
        scale = jnp.asarray(rng.standard_normal(16).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(16).astype(np.float32))
        for packing, shape in (("s", (2, 5, 9, 9, 128)), ("a", (2, 4, 8, 8, 128))):
            xb = self._xb(rng, shape)
            y = s2d.s2d_group_norm(xb, scale, bias, 4, packing=packing)
            want = s2d.s2d_conv3x3(jax.nn.relu(y), w, packing=packing, stride=1)
            arow, brow = s2d._s2d_gn_fold(xb, scale, bias, 4, 1e-5, packing)
            got = s2d.s2d_gn_relu_conv3x3(xb, arow, brow, w, packing)
            assert got.shape == want.shape
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-3, atol=2e-3, err_msg=packing)

    def test_fold_fallback_matches_unfused(self, rng):
        """Shapes off the kernel contract (k%128 != 0) take the in-wrapper
        fallback, which must match the unfused composition too."""
        from multimodal_pl_tpu.ops import s2d

        xb = self._xb(rng, (1, 4, 9, 9, 24))          # c=3 -> k=24, fallback
        w = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 5)).astype(np.float32))
        scale = jnp.asarray(rng.standard_normal(3).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(3).astype(np.float32))
        for packing in ("s", "a"):
            y = s2d.s2d_group_norm(xb, scale, bias, 1, packing=packing)
            want = s2d.s2d_conv3x3(jax.nn.relu(y), w, packing=packing, stride=1)
            arow, brow = s2d._s2d_gn_fold(xb, scale, bias, 1, 1e-5, packing)
            got = s2d.s2d_gn_relu_conv3x3(xb, arow, brow, w, packing)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-4, err_msg=packing)

    def test_model_flag_matches_unfused(self, rng):
        """set_k2_fused_gn routes NoBottleneckS2D's stride-1 convs through the
        fused path with an unchanged param tree and matching output."""
        from multimodal_pl_tpu.models.blocks import NoBottleneckS2D
        from multimodal_pl_tpu.ops import s2d

        xb = self._xb(rng, (1, 5, 9, 9, 128))          # shifted, c=16
        m = NoBottleneckS2D(16, stride=1, group=4)
        params = m.init(jax.random.PRNGKey(0), xb)
        want = m.apply(params, xb)
        try:
            s2d.set_k2_fused_gn(True)
            params2 = m.init(jax.random.PRNGKey(0), xb)
            got = m.apply(params, xb)
        finally:
            s2d.set_k2_fused_gn(False)
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)
