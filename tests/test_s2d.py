"""Parity tests: space-to-depth block-domain ops == voxel-domain ops.

The s2d path (ops/s2d.py, the TPU lane-padding fix for full-resolution C=32
stages) must be an exact reformulation of the reference ops: same parameter
tree, same math. Each op is pinned against its voxel-domain twin, and the
full flagship model is compared end to end between the two domains.
"""

import jax
import jax.experimental
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_pl_tpu.models import UNet3DFEAM, init_class_tokens
from multimodal_pl_tpu.ops.conv import conv3d
from multimodal_pl_tpu.ops.norm import group_norm
from multimodal_pl_tpu.ops.resize import upsample_trilinear
from multimodal_pl_tpu.ops.s2d import (
    depth_to_space,
    depth_to_space_shifted,
    s2d_conv1x1,
    s2d_conv3x3,
    s2d_group_norm,
    s2d_upsample_trilinear,
    space_to_depth,
    space_to_depth_shifted,
)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8, 3)), jnp.float32)
    xb = space_to_depth(x)
    assert xb.shape == (2, 2, 3, 4, 24)
    np.testing.assert_array_equal(depth_to_space(xb), x)


def test_s2d_packing_is_position_major(rng):
    # voxel (d,h,w) offset (pd,ph,pw) of block (i,j,k) lands at channel pos*C+c
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 3)), jnp.float32)
    xb = space_to_depth(x)
    for pd in range(2):
        for ph in range(2):
            for pw in range(2):
                pos = (pd * 2 + ph) * 2 + pw
                np.testing.assert_array_equal(
                    xb[0, 1, 0, 1, pos * 3 : (pos + 1) * 3],
                    x[0, 2 + pd, 0 + ph, 2 + pw, :],
                )


def test_shifted_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8, 3)), jnp.float32)
    xs = space_to_depth_shifted(x)
    assert xs.shape == (2, 3, 4, 5, 24)
    np.testing.assert_array_equal(depth_to_space_shifted(xs), x)


def test_s2d_conv3x3_a2s_matches_voxel(rng):
    """Aligned input -> shifted output; boundary slabs are don't-care."""
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 5)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(5), jnp.float32)
    ref = conv3d(x, w, stride=1, padding=1, bias=bias)
    out = s2d_conv3x3(space_to_depth(x), w, packing="a", bias=bias)
    assert out.shape == (2, 3, 4, 5, 40)
    np.testing.assert_allclose(np.asarray(depth_to_space_shifted(out)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_s2d_conv3x3_from_shifted_matches_voxel(rng, stride):
    """Shifted (zero-slab) input -> aligned (s=1) / voxel (s=2) output."""
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 5)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(5), jnp.float32)
    ref = conv3d(x, w, stride=stride, padding=1, bias=bias)
    out = s2d_conv3x3(space_to_depth_shifted(x), w, packing="s", stride=stride, bias=bias)
    if stride == 1:
        out = depth_to_space(out)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_s2d_conv3x3_stride2_from_aligned_matches_voxel(rng):
    """Aligned input, stride 2 -> half-resolution voxel output (refiner stem)."""
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8, 2)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 2, 5)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(5), jnp.float32)
    ref = conv3d(x, w, stride=2, padding=1, bias=bias)
    out = s2d_conv3x3(space_to_depth(x), w, packing="a", stride=2, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_refiner_s2d_parity(rng):
    from multimodal_pl_tpu.models import RefinerUNet3D
    # refiner geometry needs >=32 voxels per axis (5 stride-2 levels)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 2)), jnp.float32)
    m_v = RefinerUNet3D(s2d=False)
    m_b = RefinerUNet3D(s2d=True)
    params = m_v.init(jax.random.PRNGKey(0), x)
    params_b = m_b.init(jax.random.PRNGKey(0), x)
    chk = jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params_b)
    del chk
    ov, ob = np.asarray(m_v.apply(params, x)), np.asarray(m_b.apply(params, x))
    err = np.max(np.abs(ov - ob)) / max(1.0, np.max(np.abs(ov)))
    assert err < 3e-2, f"refiner s2d parity: {err:.2e}"


def test_a2s_then_s2a_composes(rng):
    """Two chained convs across an (exactly zeroed) shifted intermediate ==
    two voxel convs — the NoBottleneck inner pattern."""
    from multimodal_pl_tpu.ops.s2d import _shifted_interior_mask
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8, 4)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 3, 4, 4)) * 0.2, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 3, 4, 4)) * 0.2, jnp.float32)
    ref = conv3d(conv3d(x, w1, stride=1, padding=1), w2, stride=1, padding=1)
    mid = s2d_conv3x3(space_to_depth(x), w1, packing="a")
    mask = _shifted_interior_mask(mid.shape[1:4], mid.dtype)
    mid = mid * mask.reshape(*mid.shape[1:4], 8).repeat(4, -1).reshape(1, *mid.shape[1:])
    out = depth_to_space(s2d_conv3x3(mid, w2, packing="s"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("packing", ["a", "s"])
@pytest.mark.parametrize("stride", [1, 2])
def test_s2d_conv1x1_matches_voxel(rng, packing, stride):
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((1, 1, 1, 4, 6)) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(6), jnp.float32)
    ref = conv3d(x, w, stride=stride, padding=0, bias=bias)
    xb = space_to_depth(x) if packing == "a" else space_to_depth_shifted(x)
    out = s2d_conv1x1(xb, w, packing=packing, stride=stride, bias=bias)
    if stride == 1:
        out = depth_to_space(out) if packing == "a" else depth_to_space_shifted(out)
        # shifted s1 keeps slab garbage = bias; interior must match
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("packing", ["a", "s"])
def test_s2d_group_norm_matches_voxel(rng, packing):
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8, 32)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(32), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(32), jnp.float32)
    ref = group_norm(x, scale, bias, num_groups=16)
    if packing == "a":
        out = depth_to_space(
            s2d_group_norm(space_to_depth(x), scale, bias, num_groups=16))
    else:
        # garbage in the boundary slabs must not affect stats, and the output
        # slabs must come back zero
        xs = space_to_depth_shifted(x)
        garbage = jnp.asarray(rng.standard_normal(xs.shape) * 100, jnp.float32)
        from multimodal_pl_tpu.ops.s2d import _shifted_interior_mask
        m = _shifted_interior_mask(xs.shape[1:4], xs.dtype)
        m = jnp.repeat(m, 32, axis=-1).reshape(1, *xs.shape[1:])
        xs = xs * m + garbage * (1 - m)
        os_ = s2d_group_norm(xs, scale, bias, num_groups=16, packing="s")
        np.testing.assert_array_equal(np.asarray(os_ * (1 - m)), 0.0)
        out = depth_to_space_shifted(os_)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("packing", ["a", "s"])
def test_s2d_upsample_matches_trilinear(rng, packing):
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 5, 7)), jnp.float32)
    ref = upsample_trilinear(x, 2)
    out = s2d_upsample_trilinear(x, packing=packing)
    out = depth_to_space(out) if packing == "a" else depth_to_space_shifted(out)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_s2d_upsample_shifted_has_zero_slabs(rng):
    x = jnp.asarray(rng.standard_normal((1, 2, 2, 2, 3)), jnp.float32)
    from multimodal_pl_tpu.ops.s2d import _shifted_interior_mask
    out = s2d_upsample_trilinear(x, packing="s")
    m = jnp.repeat(_shifted_interior_mask(out.shape[1:4], out.dtype), 3, axis=-1)
    np.testing.assert_array_equal(np.asarray(out * (1 - m.reshape(1, *out.shape[1:]))), 0.0)


class TestModelParity:
    """UNet3DFEAM(s2d=True) == UNet3DFEAM(s2d=False): same params, same outputs."""

    def _build(self, **kw):
        model = UNet3DFEAM(num_classes=14, weight_std=True, deep_up=False, **kw)
        tokens = init_class_tokens(jax.random.PRNGKey(1), 14)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 32, 32, 1)),
                        jnp.float32)
        return model, tokens, x

    def test_param_tree_identical(self):
        m_v, tokens, x = self._build(s2d=False)
        m_b, _, _ = self._build(s2d=True)
        p_v = m_v.init(jax.random.PRNGKey(0), x, tokens)
        p_b = m_b.init(jax.random.PRNGKey(0), x, tokens)
        chk = jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            p_v, p_b)
        del chk

    @staticmethod
    def _close(b, a, tol, what):
        """Normalized comparison: f32 summation-order rounding compounds
        through ~20 GN-renormalized layers (each op is exact to ~2e-7 relative,
        see the op tests and the f64 check below), so model-level parity is
        asserted relative to the tensor's own magnitude."""
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, float(np.max(np.abs(a))))
        err = float(np.max(np.abs(a - b))) / scale
        assert err < tol, f"{what}: normalized maxdiff {err:.2e} >= {tol}"

    def test_forward_parity(self):
        m_v, tokens, x = self._build(s2d=False)
        m_b, _, _ = self._build(s2d=True)
        params = m_v.init(jax.random.PRNGKey(0), x, tokens)
        out_v = m_v.apply(params, x, tokens)
        out_b = m_b.apply(params, x, tokens)
        lv, av, dv, fv, _ = out_v
        lb, ab, db, fb, _ = out_b
        self._close(lb, lv, 3e-2, "logits")
        for i, (a, b) in enumerate(zip(av, ab)):
            self._close(b, a, 3e-2, f"attn{i}")
        for i, (a, b) in enumerate(zip(dv, db)):
            self._close(b, a, 3e-2, f"deep{i}")
        for i, (a, b) in enumerate(zip(fv, fb)):
            self._close(b, a, 3e-2, f"feat{i}")

    def test_block_exact_in_f64(self):
        """A single WS-conv block matches to ~f64 precision between domains —
        pins that the divergence seen at model scale is f32 rounding, not
        wiring."""
        from multimodal_pl_tpu.models.blocks import WSConv3d, WSConv3dS2D
        from multimodal_pl_tpu.ops.s2d import (
            space_to_depth as s2d_,
            depth_to_space_shifted as d2ss_,
        )
        jax.config.update("jax_enable_x64", True)
        try:
            x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 8, 8, 32)),
                            jnp.float64)
            cv = WSConv3d(32, stride=1, padding=1)
            cb = WSConv3dS2D(32, stride=1, packing="a")
            p = cv.init(jax.random.PRNGKey(0), x.astype(jnp.float32))
            p = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), p)
            ov = np.asarray(cv.apply(p, x))
            ob = np.asarray(d2ss_(cb.apply(p, s2d_(x))))
            err = np.max(np.abs(ov - ob)) / max(1.0, np.max(np.abs(ov)))
            assert err < 1e-12, f"f64 normalized maxdiff {err:.2e}"
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_grad_parity(self):
        m_v, tokens, x = self._build(s2d=False)
        m_b, _, _ = self._build(s2d=True)
        params = m_v.init(jax.random.PRNGKey(0), x, tokens)

        def loss(m):
            def f(p):
                logits, *_ = m.apply(p, x, tokens)
                return jnp.mean(jnp.square(logits))
            return f

        g_v = jax.grad(loss(m_v))(params)
        g_b = jax.grad(loss(m_b))(params)
        flat_v, _ = jax.flatten_util.ravel_pytree(g_v)
        flat_b, _ = jax.flatten_util.ravel_pytree(g_b)
        self._close(flat_b, flat_v, 3e-2, "grads")


def test_s2d_pack_matches_stack(rng):
    from multimodal_pl_tpu.ops.s2d import s2d_pack

    a = jnp.asarray(rng.standard_normal((2, 4, 6, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 4, 6, 8)), jnp.float32)
    ref = space_to_depth(jnp.stack([a, b], axis=-1))
    np.testing.assert_array_equal(s2d_pack([a, b]), ref)


def test_s2d_conv4x4_stride2_parity(rng):
    from multimodal_pl_tpu.ops.s2d import s2d_conv4x4

    x = jnp.asarray(rng.standard_normal((2, 6, 8, 10, 2)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4, 4, 4, 2, 5)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(5), jnp.float32)
    ref = conv3d(x, w, stride=2, padding=[(1, 1)] * 3, bias=bias)
    out = s2d_conv4x4(space_to_depth(x), w, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_discriminator_plane_tuple_parity(rng):
    from multimodal_pl_tpu.models.discriminator import NormStyleDiscriminator

    prob = jnp.asarray(rng.random((3, 8, 12, 16)), jnp.float32)
    atlas = jnp.asarray(rng.random((3, 8, 12, 16)), jnp.float32)
    x = jnp.stack([prob, atlas], axis=-1)
    disc = NormStyleDiscriminator(ndf=8)
    params = disc.init(jax.random.PRNGKey(0), x)
    params_t = disc.init(jax.random.PRNGKey(0), (prob, atlas))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params_t)
    o_arr = np.asarray(disc.apply(params, x))
    o_tup = np.asarray(disc.apply(params, (prob, atlas)))
    np.testing.assert_allclose(o_tup, o_arr, rtol=1e-4, atol=1e-4)


def test_refiner_plane_tuple_parity(rng):
    from multimodal_pl_tpu.models import RefinerUNet3D

    prob = jnp.asarray(rng.random((1, 32, 32, 32)), jnp.float32)
    atlas = jnp.asarray(rng.random((1, 32, 32, 32)), jnp.float32)
    x = jnp.stack([prob, atlas], axis=-1)
    m = RefinerUNet3D()
    params = m.init(jax.random.PRNGKey(0), x)
    params_t = m.init(jax.random.PRNGKey(0), (prob, atlas))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params_t)
    o_arr = np.asarray(m.apply(params, x))
    o_tup = np.asarray(m.apply(params, (prob, atlas)))
    np.testing.assert_allclose(o_tup, o_arr, rtol=1e-5, atol=1e-5)
