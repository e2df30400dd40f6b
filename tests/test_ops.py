"""Golden parity tests for core ops against torch CPU reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from multimodal_pl_tpu.ops.conv import conv3d, standardize_kernel, ws_conv3d
from multimodal_pl_tpu.ops.norm import group_norm, layer_norm
from multimodal_pl_tpu.ops.resize import (
    downsample_nearest,
    resize_nearest,
    resize_trilinear,
    upsample_trilinear,
)


def to_torch_ncdhw(x):
    # NDHWC -> NCDHW
    return torch.from_numpy(np.asarray(x).transpose(0, 4, 1, 2, 3))


def from_torch(t):
    return t.detach().numpy().transpose(0, 2, 3, 4, 1)


class TestWSConv:
    def test_standardize_matches_torch(self, rng):
        # torch: mean over (in, kd, kh, kw) per out; unbiased var over flattened
        w = rng.standard_normal((3, 3, 3, 8, 16)).astype(np.float32)
        got = np.asarray(standardize_kernel(jnp.asarray(w)))

        wt = torch.from_numpy(w.transpose(4, 3, 0, 1, 2))  # (out, in, kd, kh, kw)
        m = wt.mean(dim=1, keepdim=True).mean(dim=2, keepdim=True).mean(dim=3, keepdim=True).mean(
            dim=4, keepdim=True
        )
        wt = wt - m
        std = torch.sqrt(torch.var(wt.reshape(wt.size(0), -1), dim=1) + 1e-12).view(-1, 1, 1, 1, 1)
        want = (wt / std).numpy().transpose(2, 3, 4, 1, 0)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("stride", [1, 2])
    def test_conv3d_matches_torch(self, rng, stride):
        x = rng.standard_normal((2, 8, 12, 12, 4)).astype(np.float32)
        w = rng.standard_normal((3, 3, 3, 4, 6)).astype(np.float32)
        got = np.asarray(conv3d(jnp.asarray(x), jnp.asarray(w), stride=stride, padding=1))
        want = F.conv3d(
            to_torch_ncdhw(x),
            torch.from_numpy(w.transpose(4, 3, 0, 1, 2)),
            stride=stride,
            padding=1,
        )
        np.testing.assert_allclose(got, from_torch(want), rtol=1e-4, atol=1e-4)

    def test_conv3d_k4_s2_p1_matches_torch(self, rng):
        # discriminator geometry
        x = rng.standard_normal((1, 8, 16, 16, 2)).astype(np.float32)
        w = rng.standard_normal((4, 4, 4, 2, 5)).astype(np.float32)
        got = np.asarray(conv3d(jnp.asarray(x), jnp.asarray(w), stride=2, padding=1))
        want = F.conv3d(
            to_torch_ncdhw(x), torch.from_numpy(w.transpose(4, 3, 0, 1, 2)), stride=2, padding=1
        )
        assert got.shape == from_torch(want).shape
        np.testing.assert_allclose(got, from_torch(want), rtol=1e-4, atol=1e-4)

    def test_ws_conv_end_to_end(self, rng):
        x = rng.standard_normal((1, 6, 6, 6, 16)).astype(np.float32)
        w = rng.standard_normal((3, 3, 3, 16, 16)).astype(np.float32)
        got = np.asarray(ws_conv3d(jnp.asarray(x), jnp.asarray(w), stride=1, padding=1))

        wt = torch.from_numpy(w.transpose(4, 3, 0, 1, 2))
        m = wt.mean(dim=1, keepdim=True).mean(dim=2, keepdim=True).mean(dim=3, keepdim=True).mean(
            dim=4, keepdim=True
        )
        wt2 = wt - m
        std = torch.sqrt(torch.var(wt2.reshape(wt2.size(0), -1), dim=1) + 1e-12).view(-1, 1, 1, 1, 1)
        want = F.conv3d(to_torch_ncdhw(x), wt2 / std, stride=1, padding=1)
        np.testing.assert_allclose(got, from_torch(want), rtol=1e-4, atol=1e-4)


class TestNorms:
    @pytest.mark.parametrize("groups,ch", [(16, 32), (4, 24), (16, 256)])
    def test_group_norm_matches_torch(self, rng, groups, ch):
        x = rng.standard_normal((2, 4, 5, 5, ch)).astype(np.float32)
        scale = rng.standard_normal(ch).astype(np.float32)
        bias = rng.standard_normal(ch).astype(np.float32)
        got = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), groups))

        gn = torch.nn.GroupNorm(groups, ch)
        with torch.no_grad():
            gn.weight.copy_(torch.from_numpy(scale))
            gn.bias.copy_(torch.from_numpy(bias))
        want = gn(to_torch_ncdhw(x))
        np.testing.assert_allclose(got, from_torch(want), rtol=1e-4, atol=1e-4)

    def test_layer_norm_matches_torch(self, rng):
        x = rng.standard_normal((2, 7, 64)).astype(np.float32)
        scale = rng.standard_normal(64).astype(np.float32)
        bias = rng.standard_normal(64).astype(np.float32)
        got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)))
        ln = torch.nn.LayerNorm(64)
        with torch.no_grad():
            ln.weight.copy_(torch.from_numpy(scale))
            ln.bias.copy_(torch.from_numpy(bias))
        want = ln(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestResize:
    def test_trilinear_up_matches_torch(self, rng):
        x = rng.standard_normal((1, 4, 6, 6, 3)).astype(np.float32)
        got = np.asarray(upsample_trilinear(jnp.asarray(x), 2))
        want = F.interpolate(to_torch_ncdhw(x), scale_factor=2, mode="trilinear")
        np.testing.assert_allclose(got, from_torch(want), rtol=1e-4, atol=1e-4)

    def test_trilinear_arbitrary_matches_torch(self, rng):
        x = rng.standard_normal((1, 5, 7, 6, 2)).astype(np.float32)
        got = np.asarray(resize_trilinear(jnp.asarray(x), (8, 11, 9)))
        want = F.interpolate(to_torch_ncdhw(x), size=(8, 11, 9), mode="trilinear")
        np.testing.assert_allclose(got, from_torch(want), rtol=1e-4, atol=1e-4)

    def test_nearest_matches_torch(self, rng):
        x = rng.standard_normal((1, 9, 13, 7, 2)).astype(np.float32)
        got = np.asarray(resize_nearest(jnp.asarray(x), (4, 5, 12)))
        want = F.interpolate(to_torch_ncdhw(x), size=(4, 5, 12), mode="nearest")
        np.testing.assert_allclose(got, from_torch(want), rtol=0, atol=0)

    def test_nearest_downsample_factor(self, rng):
        x = rng.standard_normal((1, 8, 8, 8, 2)).astype(np.float32)
        got = np.asarray(downsample_nearest(jnp.asarray(x), 2))
        want = F.interpolate(to_torch_ncdhw(x), size=(4, 4, 4), mode="nearest")
        np.testing.assert_allclose(got, from_torch(want), rtol=0, atol=0)
