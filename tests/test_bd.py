"""Parity tests: mixed-axis block-domain ops (ops/bd.py) == voxel ops.

The round-5 conv engine runs each stage on the layout that fills the 128
TPU lanes with the fewest extra MACs (C=32 -> H,W blocked; C=64 -> W
blocked; C>=128 voxel). Every op must be an exact reformulation of the
reference op (3x3x3 pad-1 conv unet3D.py:16-35, GroupNorm, trilinear x2
upsample unet3D.py:963-965): identical multiply-add sets, different
grouping.
"""

import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_pl_tpu.ops import bd
from multimodal_pl_tpu.ops.conv import conv3d
from multimodal_pl_tpu.ops.norm import group_norm
from multimodal_pl_tpu.ops.resize import upsample_trilinear

HW2 = (False, True, True)
W1 = (False, False, True)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("blocked", [HW2, W1])
def test_pack_roundtrip(rng, blocked):
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8, 3)), jnp.float32)
    xb = bd.pack(x, blocked)
    f = int(np.prod(bd.factors(blocked)))
    assert xb.shape[-1] == 3 * f
    np.testing.assert_array_equal(bd.unpack(xb, blocked), x)
    np.testing.assert_array_equal(
        bd.unpack_shifted(bd.pack_shifted(x, blocked), blocked), x)


def test_pack_is_position_major(rng):
    x = jnp.asarray(rng.standard_normal((1, 2, 4, 4, 3)), jnp.float32)
    xb = bd.pack(x, HW2)
    for ph in range(2):
        for pw in range(2):
            for c in range(3):
                np.testing.assert_array_equal(
                    xb[0, :, 0, 0, (ph * 2 + pw) * 3 + c],
                    x[0, :, ph, pw, c])


@pytest.mark.parametrize("blocked", [HW2, W1])
@pytest.mark.parametrize("packing", ["a", "s"])
def test_bd_conv3x3_stride1(rng, blocked, packing):
    ci, co = 3, 5
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8, ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)), jnp.float32)
    ref = conv3d(x, w, stride=1, padding=[(1, 1)] * 3)
    xb = bd.pack(x, blocked) if packing == "a" else bd.pack_shifted(x, blocked)
    out = bd.bd_conv3x3(xb, w, blocked, packing=packing, stride=1,
                        use_pallas=False)
    # stride 1 flips the packing on the blocked axes
    got = (bd.unpack_shifted(out, blocked) if packing == "a"
           else bd.unpack(out, blocked))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("blocked", [HW2, W1])
@pytest.mark.parametrize("packing", ["a", "s"])
def test_bd_conv3x3_stride2(rng, blocked, packing):
    ci, co = 3, 4
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8, ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)), jnp.float32)
    ref = conv3d(x, w, stride=2, padding=[(1, 1)] * 3)
    xb = bd.pack(x, blocked) if packing == "a" else bd.pack_shifted(x, blocked)
    out = bd.bd_conv3x3(xb, w, blocked, packing=packing, stride=2)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("blocked", [HW2, W1])
@pytest.mark.parametrize("packing", ["a", "s"])
def test_bd_conv1x1(rng, blocked, packing):
    ci, co = 4, 6
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8, ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((1, 1, 1, ci, co)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
    for stride in (1, 2):
        ref = conv3d(x, w, stride=stride, padding=[(0, 0)] * 3, bias=bias)
        xb = (bd.pack(x, blocked) if packing == "a"
              else bd.pack_shifted(x, blocked))
        out = bd.bd_conv1x1(xb, w, blocked, packing=packing, stride=stride,
                            bias=bias)
        if stride == 1:
            got = (bd.unpack(out, blocked) if packing == "a"
                   else bd.unpack_shifted(out, blocked))
        else:
            got = out
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("blocked", [HW2, W1])
@pytest.mark.parametrize("packing", ["a", "s"])
@pytest.mark.parametrize("relu", [False, True])
def test_bd_group_norm(rng, blocked, packing, relu):
    c, g = 8, 4
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8, c)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    ref = group_norm(x, scale, bias, g)
    if relu:
        ref = jnp.maximum(ref, 0)
    xb = bd.pack(x, blocked) if packing == "a" else bd.pack_shifted(x, blocked)
    out = bd.bd_group_norm(xb, scale, bias, g, blocked=blocked,
                           packing=packing, relu=relu)
    got = (bd.unpack(out, blocked) if packing == "a"
           else bd.unpack_shifted(out, blocked))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    if packing == "s":
        # boundary slabs re-zeroed (the next conv's SAME zero padding)
        v = bd.unpack(out, blocked)
        for ax, bl in enumerate(blocked, start=1):
            if bl:
                np.testing.assert_array_equal(
                    np.asarray(jnp.take(v, jnp.array([0, v.shape[ax] - 1]),
                                        axis=ax)), 0.0)


@pytest.mark.parametrize("blocked", [HW2, W1])
def test_bd_upsample(rng, blocked):
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 5, 6)), jnp.float32)
    ref = upsample_trilinear(x, 2)
    out = bd.bd_upsample_trilinear(x, blocked, packing="s")
    got = bd.unpack_shifted(out, blocked)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    out_a = bd.bd_upsample_trilinear(x, blocked, packing="a")
    np.testing.assert_allclose(bd.unpack(out_a, blocked), ref,
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("blocked", [HW2, W1])
def test_bd_conv_chain_alternation(rng, blocked):
    """Two stride-1 convs alternate packings with zero repacks: s -> a -> s,
    with a masked GN+ReLU between (the NoBottleneck inner pattern)."""
    c = 4
    x = jnp.asarray(rng.standard_normal((1, 4, 6, 8, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 3, c, c)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 3, c, c)), jnp.float32)
    sc = jnp.ones((c,), jnp.float32)
    bi = jnp.zeros((c,), jnp.float32)
    ref = conv3d(x, w1, stride=1, padding=[(1, 1)] * 3)
    ref = jnp.maximum(group_norm(ref, sc, bi, 2), 0)
    ref = conv3d(ref, w2, stride=1, padding=[(1, 1)] * 3)
    xb = bd.pack_shifted(x, blocked)
    yb = bd.bd_conv3x3(xb, w1, blocked, packing="s", use_pallas=False)
    yb = bd.bd_group_norm(yb, sc, bi, 2, blocked=blocked, packing="a",
                          relu=True)
    yb = bd.bd_conv3x3(yb, w2, blocked, packing="a", use_pallas=False)
    got = bd.unpack_shifted(yb, blocked)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


class TestFullModelBD:
    """Flagship forward parity: mixed-axis bd engine vs voxel domain, same
    params (the bd twin of test_s2d.TestFullModel)."""

    def _build(self, **kw):
        import jax

        from multimodal_pl_tpu.models import UNet3DFEAM, init_class_tokens

        model = UNet3DFEAM(num_classes=14, weight_std=True, deep_up=False, **kw)
        tokens = init_class_tokens(jax.random.PRNGKey(1), 14)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 16, 32, 32, 1)),
            jnp.float32)
        return model, tokens, x

    def test_param_tree_identical(self):
        import jax

        m_v, tokens, x = self._build(s2d=False)
        m_b, _, _ = self._build(s2d=False, bd=True)
        p_v = m_v.init(jax.random.PRNGKey(0), x, tokens)
        p_b = m_b.init(jax.random.PRNGKey(0), x, tokens)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            p_v, p_b)

    @staticmethod
    def _close(b, a, tol, what):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, float(np.max(np.abs(a))))
        err = float(np.max(np.abs(a - b))) / scale
        assert err < tol, f"{what}: normalized maxdiff {err:.2e} >= {tol}"

    def test_forward_parity(self):
        import jax

        m_v, tokens, x = self._build(s2d=False)
        m_b, _, _ = self._build(s2d=False, bd=True)
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


@pytest.mark.parametrize("blocked,c", [(HW2, 32), (W1, 64)])
def test_bdx_fused_chain(rng, blocked, c):
    """Fused masked-GN->ReLU->conv canvas chain (ops/pallas/bdx.py,
    interpret mode on CPU) == the unfused voxel composition, through a full
    NoBottleneck inner pattern: s-conv then a-conv."""
    import jax

    from multimodal_pl_tpu.ops.norm import group_norm

    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 3, c, c)) * 0.2, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 3, c, c)) * 0.2, jnp.float32)
    s1 = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    s2 = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((c,)), jnp.float32)

    ref = conv3d(jnp.maximum(group_norm(x, s1, b1, 16), 0), w1,
                 stride=1, padding=[(1, 1)] * 3)
    ref = conv3d(jnp.maximum(group_norm(ref, s2, b2, 16), 0), w2,
                 stride=1, padding=[(1, 1)] * 3)

    xb = bd.pack_shifted(x, blocked)
    dims_s = tuple(xb.shape[1:4])
    wb = bd.chain_wb(xb.shape[3])
    fold1 = bd.bd_gn_fold(xb, s1, b1, 16, blocked=blocked, packing="s")
    c0 = bd.to_canvas(xb, wb)
    c1 = bd.bd_gn_relu_conv3x3(c0, fold1[0], fold1[1], w1, blocked, "s",
                               true_dims=dims_s, wb=wb)
    assert c1 is not None
    dims_a = tuple(n - 1 if bl else n
                   for n, bl in zip(dims_s, (False,) + tuple(blocked[1:])))
    dims_a = (dims_s[0],
              dims_s[1] - 1 if blocked[1] else dims_s[1],
              dims_s[2] - 1 if blocked[2] else dims_s[2])
    fold2 = bd.bd_gn_fold_canvas(c1, s2, b2, 16, true_dims=dims_a, wb=wb,
                                 blocked=blocked, packing="a")
    c2 = bd.bd_gn_relu_conv3x3(c1, fold2[0], fold2[1], w2, blocked, "a",
                               true_dims=dims_a, wb=wb)
    assert c2 is not None
    out = bd.from_canvas(c2, dims_s[1], dims_s[2], wb)
    got = bd.unpack_shifted(out, blocked)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("blocked,cin,feat", [(HW2, 32, 32), (W1, 64, 64),
                                              (HW2, 64, 32)])
def test_nobottleneck_bd_fused_parity(rng, blocked, cin, feat):
    """NoBottleneckBD fused branch (bdx canvas chain) == unfused branch,
    same params (interpret mode on CPU)."""
    import jax

    from multimodal_pl_tpu.models.blocks import NoBottleneckBD
    from multimodal_pl_tpu.ops import bd as bd_mod

    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, cin)), jnp.float32)
    xb = bd_mod.pack_shifted(x, blocked)
    blk = NoBottleneckBD(feat, stride=1, blocked=blocked)
    params = blk.init(jax.random.PRNGKey(0), xb)
    ref = blk.apply(params, xb)
    bd_mod.set_bd_fused(True)
    try:
        got = blk.apply(params, xb)
    finally:
        bd_mod.set_bd_fused(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_bd_model_grad(rng):
    """bd-mode flagship differentiates (training path: XLA lowerings of the
    blocked convs; grads match the voxel model's on the same params)."""
    import jax

    from multimodal_pl_tpu.models import UNet3DFEAM, init_class_tokens

    tokens = init_class_tokens(jax.random.PRNGKey(1), 14)
    x = jnp.asarray(rng.standard_normal((1, 16, 32, 32, 1)), jnp.float32)
    m_v = UNet3DFEAM(num_classes=14, weight_std=True, s2d=False)
    m_b = UNet3DFEAM(num_classes=14, weight_std=True, s2d=False, bd=True)
    params = m_v.init(jax.random.PRNGKey(0), x, tokens)

    def loss(m):
        return lambda p: jnp.mean(jnp.square(m.apply(p, x, tokens)[0]))

    g_v = jax.grad(loss(m_v))(params)
    g_b = jax.grad(loss(m_b))(params)
    lv, _ = jax.flatten_util.ravel_pytree(g_v)
    lb, _ = jax.flatten_util.ravel_pytree(g_b)
    scale = float(jnp.max(jnp.abs(lv))) + 1e-9
    err = float(jnp.max(jnp.abs(lv - lb))) / scale
    assert err < 3e-2, f"grad normalized maxdiff {err:.2e}"


def test_voxel_nobottleneck_fused_parity(rng):
    """Voxel NoBottleneck's fused bdx branch (C>=128 stages, all-voxel axis
    modes) == its unfused branch, same params."""
    import jax

    from multimodal_pl_tpu.models.blocks import NoBottleneck
    from multimodal_pl_tpu.ops import bd as bd_mod

    x = jnp.asarray(rng.standard_normal((1, 4, 6, 8, 128)), jnp.float32)
    blk = NoBottleneck(128, stride=1)
    params = blk.init(jax.random.PRNGKey(0), x)
    ref = blk.apply(params, x)
    bd_mod.set_bd_fused(True)
    try:
        got = blk.apply(params, x)
    finally:
        bd_mod.set_bd_fused(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
