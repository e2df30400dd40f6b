"""Building blocks for the 3D U-Net family (channels-last, flax.linen).

Mirrors the behavior of the reference blocks (cited per class) while using
explicit torch-convention padding so strided convs align voxel-for-voxel.
Initializers reproduce torch's kaiming_uniform(a=sqrt(5)) Conv/Linear default.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from multimodal_pl_tpu.ops.conv import conv3d, standardize_kernel
from multimodal_pl_tpu.ops.s2d import (
    _s2d_gn_fold,
    k2_fused_gn_enabled,
    s2d_conv1x1,
    s2d_conv3x3,
    s2d_conv4x4,
    s2d_gn_relu_conv3x3,
    s2d_group_norm,
)

# torch Conv/Linear default weight init: kaiming_uniform(a=sqrt(5)) ==
# U(-sqrt(1/fan_in), sqrt(1/fan_in)) == variance_scaling(1/3, fan_in, uniform)
torch_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class WSConv3d(nn.Module):
    """(Optionally weight-standardized) 3D conv — reference unet3D.py:16-35.

    Padding is explicit symmetric (torch convention), so strided convs match
    torch alignment rather than XLA 'SAME' lo/hi asymmetry.
    """

    features: int
    kernel: Sequence[int] = (3, 3, 3)
    stride: int | Sequence[int] = 1
    padding: int | Sequence[int] = 1
    use_bias: bool = False
    weight_std: bool = True

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = self.kernel
        w = self.param(
            "kernel", torch_init, (kd, kh, kw, x.shape[-1], self.features), jnp.float32
        )
        w = w.astype(x.dtype)
        if self.weight_std:
            w = standardize_kernel(w)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)] * 3
        else:
            pad = [(p, p) for p in pad]
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            bias = bias.astype(x.dtype)
        return conv3d(x, w, stride=self.stride, padding=pad, bias=bias)


class GroupNorm(nn.Module):
    """torch-compatible GroupNorm (eps=1e-5, contiguous channel groups).

    relu=True fuses the trailing ReLU of the pre-activation pattern into the
    call — routed through the Pallas fused kernel when
    ops.norm.set_fused_gn_relu(True) is active (param tree unchanged)."""

    num_groups: int
    eps: float = 1e-5
    relu: bool = False

    @nn.compact
    def __call__(self, x, fold: bool = False, canvas=None):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        if fold:
            # (arow, brow) statistics fold for the fused GN->ReLU->conv path
            # (ops/pallas/bdx.py); voxel tensors are the all-unblocked case
            # of the bd folds. canvas=(true_dims, wb) when x is a canvas.
            from multimodal_pl_tpu.ops import bd as _bdm

            nob = (False, False, False)
            if canvas is not None:
                true_dims, wb = canvas
                return _bdm.bd_gn_fold_canvas(x, scale, bias, self.num_groups,
                                              true_dims, wb, self.eps,
                                              blocked=nob, packing="a")
            return _bdm.bd_gn_fold(x, scale, bias, self.num_groups, self.eps,
                                   blocked=nob, packing="a")
        from multimodal_pl_tpu.ops.norm import group_norm, group_norm_relu

        if self.relu:
            return group_norm_relu(x, scale.astype(x.dtype), bias.astype(x.dtype),
                                   self.num_groups, self.eps)
        return group_norm(x, scale.astype(x.dtype), bias.astype(x.dtype), self.num_groups, self.eps)


class GNReLUConv(nn.Module):
    """GroupNorm -> ReLU -> 1x1x1 (or kxkxk) conv head.

    The pattern of the reference's fusionConv / deepout / precls_conv heads
    (unet3D.py:957-1004).
    """

    features: int
    num_groups: int = 16
    kernel: Sequence[int] = (1, 1, 1)
    stride: int | Sequence[int] = 1
    padding: int = 0
    weight_std: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        x = GroupNorm(self.num_groups, relu=True, name="gn")(x)
        return WSConv3d(
            self.features,
            kernel=self.kernel,
            stride=self.stride,
            padding=self.padding,
            use_bias=self.use_bias,
            weight_std=self.weight_std,
            name="conv",
        )(x)


class NoBottleneck(nn.Module):
    """Pre-activation residual block — reference unet3D.py:40-73.

    GN -> ReLU -> conv3(s) -> GN -> ReLU -> conv3(1), plus a GN-ReLU-conv1(s)
    projection shortcut when the stride or channel count changes.
    """

    features: int
    stride: int | Sequence[int] = 1
    group: int = 16
    weight_std: bool = True

    @nn.compact
    def __call__(self, x):
        inplanes = x.shape[-1]
        stride = self.stride if not isinstance(self.stride, int) else (self.stride,) * 3
        needs_proj = any(s != 1 for s in stride) or inplanes != self.features

        from multimodal_pl_tpu.ops import bd as _bdm

        if (_bdm.bd_fused_enabled() and all(s == 1 for s in stride)
                and inplanes % 128 == 0 and self.features % 128 == 0
                and int(x.shape[1]) >= 3 and int(x.shape[2]) >= 3):
            # fused masked-GN->ReLU->tap-exact-conv chain for the voxel
            # C>=128 stages (ops/pallas/bdx.py, all-voxel axis modes) —
            # inference-only gate, identical math + param tree
            nob = (False, False, False)
            dims = tuple(int(v) for v in x.shape[1:4])
            wb = _bdm.chain_wb(dims[2])
            fold1 = GroupNorm(self.group, name="gn1")(x, fold=True)
            c0 = _bdm.to_canvas(x, wb)
            c1 = WSConv3dBD(self.features, stride=1,
                            weight_std=self.weight_std, blocked=nob,
                            packing="a", name="conv1")(
                c0, gn_fold=fold1, canvas=(dims, wb))
            fold2 = GroupNorm(self.group, name="gn2")(c1, fold=True,
                                                      canvas=(dims, wb))
            c2 = WSConv3dBD(self.features, stride=1,
                            weight_std=self.weight_std, blocked=nob,
                            packing="a", name="conv2")(
                c1, gn_fold=fold2, canvas=(dims, wb),
                res=None if needs_proj else c0)
            out = _bdm.from_canvas(c2, dims[1], dims[2], wb)
            if needs_proj:
                return out + GNReLUConv(
                    self.features, num_groups=self.group, kernel=(1, 1, 1),
                    stride=1, padding=0, weight_std=self.weight_std,
                    use_bias=False, name="downsample")(x)
            return out  # residual added in-kernel (res=c0)

        out = GroupNorm(self.group, relu=True, name="gn1")(x)
        out = WSConv3d(
            self.features, stride=stride, padding=1, weight_std=self.weight_std, name="conv1"
        )(out)
        out = GroupNorm(self.group, relu=True, name="gn2")(out)
        out = WSConv3d(self.features, stride=1, padding=1, weight_std=self.weight_std, name="conv2")(out)

        residual = x
        if needs_proj:
            residual = GNReLUConv(
                self.features,
                num_groups=self.group,
                kernel=(1, 1, 1),
                stride=stride,
                padding=0,
                weight_std=self.weight_std,
                use_bias=False,
                name="downsample",
            )(x)
        return out + residual


class WSConv3dS2D(nn.Module):
    """WSConv3d computed in the space-to-depth block domain (ops/s2d.py).

    Parameters are IDENTICAL to :class:`WSConv3d` (same names, same voxel-
    domain shapes), so a model can switch domains per input shape without
    changing its checkpoint format. `packing` is the INPUT packing ('a'
    aligned / 's' shifted); a stride-1 k3 conv flips it (zero data movement —
    the half-block shift rides on the conv's lo/hi padding), a stride-2 conv
    exits to the half-resolution voxel domain, and a 1x1 conv preserves it.
    Only the reference's conv configs are supported: k3/pad1 and k1/pad0.
    """

    features: int
    kernel: Sequence[int] = (3, 3, 3)
    stride: int = 1
    use_bias: bool = False
    weight_std: bool = True
    packing: str = "a"

    @nn.compact
    def __call__(self, xb, gn_fold=None):
        kd, kh, kw = self.kernel
        ci = xb.shape[-1] // 8
        w = self.param(
            "kernel", torch_init, (kd, kh, kw, ci, self.features), jnp.float32
        )
        w = w.astype(xb.dtype)
        if self.weight_std:
            w = standardize_kernel(w)
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            bias = bias.astype(xb.dtype)
        if gn_fold is not None:
            # fused GN->ReLU->conv input path (ops/s2d.s2d_gn_relu_conv3x3);
            # xb is the RAW pre-norm tensor, gn_fold the stats fold from
            # GroupNormS2D(fold=True). Only the k3/stride-1/no-bias config.
            assert (kd, kh, kw) == (3, 3, 3) and self.stride == 1 and bias is None
            return s2d_gn_relu_conv3x3(xb, gn_fold[0], gn_fold[1], w,
                                       packing=self.packing)
        if (kd, kh, kw) == (1, 1, 1):
            return s2d_conv1x1(xb, w, packing=self.packing, stride=self.stride, bias=bias)
        assert (kd, kh, kw) == (3, 3, 3), "s2d path supports k3/pad1 and k1/pad0 only"
        return s2d_conv3x3(xb, w, packing=self.packing, stride=self.stride, bias=bias)


class WSConv4x4S2D(nn.Module):
    """k4 stride-2 pad-1 conv computed from ALIGNED block input (the
    discriminator pyramid stem). Param names/shapes identical to
    ``WSConv3d(kernel=(4,4,4), stride=2, padding=1)`` — voxel-format
    (4,4,4,ci,co) kernel, assembled into the block-domain (3,3,3,8ci,co)
    form at call time."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, xb):
        ci = xb.shape[-1] // 8
        w = self.param("kernel", torch_init, (4, 4, 4, ci, self.features), jnp.float32)
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            bias = bias.astype(xb.dtype)
        return s2d_conv4x4(xb, w.astype(xb.dtype), bias=bias)


class GroupNormS2D(nn.Module):
    """GroupNorm on a block tensor — identical params/stats to
    :class:`GroupNorm`. With packing='s', boundary slabs are excluded from
    the statistics and zeroed on output (restoring conv 'SAME' zero padding).
    """

    num_groups: int
    eps: float = 1e-5
    packing: str = "a"

    @nn.compact
    def __call__(self, xb, fold: bool = False):
        c = xb.shape[-1] // 8
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        if fold:
            # return the statistics fold (arow, brow) for the fused
            # GN->ReLU->conv path instead of normalizing here
            return _s2d_gn_fold(xb, scale, bias, self.num_groups, self.eps,
                                self.packing)
        return s2d_group_norm(xb, scale, bias, self.num_groups, self.eps,
                              packing=self.packing)


class GNReLUConvS2D(nn.Module):
    """Block-domain GN -> ReLU -> 1x1 conv head (param-compatible with
    :class:`GNReLUConv` restricted to its k=1 configs). Output packing equals
    input packing for stride 1; stride 2 exits to the voxel domain."""

    features: int
    num_groups: int = 16
    stride: int = 1
    weight_std: bool = False
    use_bias: bool = True
    packing: str = "a"

    @nn.compact
    def __call__(self, xb):
        xb = GroupNormS2D(self.num_groups, packing=self.packing, name="gn")(xb)
        xb = nn.relu(xb)
        return WSConv3dS2D(
            self.features,
            kernel=(1, 1, 1),
            stride=self.stride,
            use_bias=self.use_bias,
            weight_std=self.weight_std,
            packing=self.packing,
            name="conv",
        )(xb)


class NoBottleneckS2D(nn.Module):
    """:class:`NoBottleneck` on SHIFTED block tensors.

    stride=1: gn1(masked) -> relu -> conv(s2a) -> gn2(aligned) -> relu ->
    conv(a2s) -> + residual — in/out both shifted, zero shuffles.
    stride=2: conv1 and the projection exit to the half-resolution voxel
    domain (their output grid is the block grid), so the second conv and the
    residual sum run as plain voxel ops.
    """

    features: int
    stride: int = 1
    group: int = 16
    weight_std: bool = True

    @nn.compact
    def __call__(self, xb):
        inplanes = xb.shape[-1] // 8
        needs_proj = self.stride != 1 or inplanes != self.features

        fused = k2_fused_gn_enabled() and self.stride == 1
        if fused:
            # GN+ReLU ride the conv kernel's input path (normalized tensor
            # never hits HBM); identical math + param tree, eval-only gate.
            fold = GroupNormS2D(self.group, packing="s", name="gn1")(xb, fold=True)
            out = WSConv3dS2D(
                self.features, stride=1, weight_std=self.weight_std,
                packing="s", name="conv1"
            )(xb, gn_fold=fold)
        else:
            out = GroupNormS2D(self.group, packing="s", name="gn1")(xb)
            out = nn.relu(out)
            out = WSConv3dS2D(
                self.features, stride=self.stride, weight_std=self.weight_std,
                packing="s", name="conv1"
            )(out)
        if self.stride == 1:
            if fused:
                fold = GroupNormS2D(self.group, packing="a", name="gn2")(out, fold=True)
                out = WSConv3dS2D(self.features, stride=1, weight_std=self.weight_std,
                                  packing="a", name="conv2")(out, gn_fold=fold)
            else:
                out = GroupNormS2D(self.group, packing="a", name="gn2")(out)
                out = nn.relu(out)
                out = WSConv3dS2D(self.features, stride=1, weight_std=self.weight_std,
                                  packing="a", name="conv2")(out)
        else:
            out = GroupNorm(self.group, name="gn2")(out)
            out = nn.relu(out)
            out = WSConv3d(self.features, stride=1, padding=1, weight_std=self.weight_std,
                           name="conv2")(out)

        residual = xb
        if needs_proj:
            residual = GNReLUConvS2D(
                self.features,
                num_groups=self.group,
                stride=self.stride,
                weight_std=self.weight_std,
                use_bias=False,
                packing="s",
                name="downsample",
            )(xb)
        return out + residual


class ResStageS2D(nn.Module):
    """:class:`ResStage` on shifted block tensors. With stride=2 the first
    block exits the block domain and the remaining blocks are plain
    :class:`NoBottleneck`s."""

    features: int
    blocks: int
    stride: int = 1
    group: int = 16
    weight_std: bool = True

    @nn.compact
    def __call__(self, xb):
        x = NoBottleneckS2D(
            self.features, stride=self.stride, group=self.group,
            weight_std=self.weight_std, name="block0"
        )(xb)
        block = NoBottleneck if self.stride != 1 else NoBottleneckS2D
        for i in range(1, self.blocks):
            x = block(
                self.features, stride=1, group=self.group, weight_std=self.weight_std,
                name=f"block{i}"
            )(x)
        return x


class ResStage(nn.Module):
    """A stack of NoBottleneck blocks — reference _make_layer (unet3D.py:1029-1049).

    Only the first block strides / changes channels; the rest are identity-residual.
    """

    features: int
    blocks: int
    stride: int | Sequence[int] = 1
    group: int = 16
    weight_std: bool = True

    @nn.compact
    def __call__(self, x):
        x = NoBottleneck(
            self.features, stride=self.stride, group=self.group, weight_std=self.weight_std, name="block0"
        )(x)
        for i in range(1, self.blocks):
            x = NoBottleneck(
                self.features, stride=1, group=self.group, weight_std=self.weight_std, name=f"block{i}"
            )(x)
        return x


# --------------------------------------------------------------------------- #
# mixed-axis block-domain twins (ops/bd.py — the round-5 conv engine)
# --------------------------------------------------------------------------- #

from multimodal_pl_tpu.ops import bd as _bd  # noqa: E402


class WSConv3dBD(nn.Module):
    """WSConv3d computed on a mixed-axis blocked tensor (ops/bd.py).

    Parameters are IDENTICAL to :class:`WSConv3d` (same names, voxel-domain
    shapes) — checkpoint format unchanged. `blocked` names the input layout,
    `packing` the input packing on its blocked axes; a stride-1 k3 conv flips
    the packing, a stride-2 conv exits to the half-resolution voxel grid, a
    1x1 conv preserves it. Only the reference's conv configs are supported:
    k3/pad1 and k1/pad0."""

    features: int
    kernel: Sequence[int] = (3, 3, 3)
    stride: int = 1
    use_bias: bool = False
    weight_std: bool = True
    blocked: Sequence[bool] = (False, True, True)
    packing: str = "a"

    @nn.compact
    def __call__(self, xb, gn_fold=None, canvas=None, res=None):
        import numpy as _np

        kd, kh, kw = self.kernel
        f = int(_np.prod(_bd.factors(self.blocked)))
        ci = xb.shape[-1] // f
        w = self.param("kernel", torch_init, (kd, kh, kw, ci, self.features),
                       jnp.float32)
        w = w.astype(xb.dtype)
        if self.weight_std:
            w = standardize_kernel(w)
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,), jnp.float32).astype(xb.dtype)
        if (kd, kh, kw) == (1, 1, 1):
            return _bd.bd_conv1x1(xb, w, self.blocked, packing=self.packing,
                                  stride=self.stride, bias=bias)
        assert (kd, kh, kw) == (3, 3, 3), "bd path supports k3/pad1 and k1/pad0"
        if gn_fold is not None:
            # fused masked-GN->ReLU->conv on a bdx CANVAS input (inference
            # path); canvas = (true_dims, wb). Identical math + param tree.
            assert self.stride == 1 and bias is None
            true_dims, wb = canvas
            out = _bd.bd_gn_relu_conv3x3(xb, gn_fold[0], gn_fold[1], w,
                                         self.blocked, self.packing,
                                         true_dims=true_dims, wb=wb, res=res)
            assert out is not None, "bdx contract violated (check eligibility)"
            return out
        return _bd.bd_conv3x3(xb, w, self.blocked, packing=self.packing,
                              stride=self.stride, bias=bias)


class GroupNormBD(nn.Module):
    """GroupNorm on a mixed-axis blocked tensor — identical params/stats to
    :class:`GroupNorm`. With packing='s', the blocked axes' boundary slabs
    are excluded from the statistics and zeroed on output."""

    num_groups: int
    eps: float = 1e-5
    blocked: Sequence[bool] = (False, True, True)
    packing: str = "a"
    relu: bool = False

    @nn.compact
    def __call__(self, xb, fold: bool = False, canvas=None):
        import numpy as _np

        f = int(_np.prod(_bd.factors(self.blocked)))
        c = xb.shape[-1] // f
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        if fold:
            # return the (arow, brow) statistics fold for the fused
            # GN->ReLU->conv path; canvas=(true_dims, wb) when xb is a bdx
            # canvas tensor
            if canvas is not None:
                true_dims, wb = canvas
                return _bd.bd_gn_fold_canvas(xb, scale, bias, self.num_groups,
                                             true_dims, wb, self.eps,
                                             blocked=self.blocked,
                                             packing=self.packing)
            return _bd.bd_gn_fold(xb, scale, bias, self.num_groups, self.eps,
                                  blocked=self.blocked, packing=self.packing)
        return _bd.bd_group_norm(xb, scale, bias, self.num_groups, self.eps,
                                 blocked=self.blocked, packing=self.packing,
                                 relu=self.relu)


class GNReLUConvBD(nn.Module):
    """Blocked GN -> ReLU -> 1x1 conv head (param-compatible with
    :class:`GNReLUConv` restricted to k=1). stride 2 exits to the voxel
    grid."""

    features: int
    num_groups: int = 16
    stride: int = 1
    weight_std: bool = False
    use_bias: bool = True
    blocked: Sequence[bool] = (False, True, True)
    packing: str = "a"

    @nn.compact
    def __call__(self, xb):
        xb = GroupNormBD(self.num_groups, blocked=self.blocked,
                         packing=self.packing, relu=True, name="gn")(xb)
        return WSConv3dBD(
            self.features, kernel=(1, 1, 1), stride=self.stride,
            use_bias=self.use_bias, weight_std=self.weight_std,
            blocked=self.blocked, packing=self.packing, name="conv")(xb)


class NoBottleneckBD(nn.Module):
    """:class:`NoBottleneck` on mixed-axis blocked tensors.

    stride=1: in/out both SHIFTED in `blocked` layout (gn1 masked -> conv
    s->a -> gn2 aligned -> conv a->s -> + residual, zero repacks).
    stride=2: conv1 and the projection exit to the half-resolution voxel
    grid; the second conv runs in `out_blocked` (the target stage's layout,
    aligned->shifted), and the block's output is SHIFTED in `out_blocked`
    (voxel passthrough when out_blocked has no blocked axis)."""

    features: int
    stride: int = 1
    group: int = 16
    weight_std: bool = True
    blocked: Sequence[bool] = (False, True, True)

    @nn.compact
    def __call__(self, xb):
        import numpy as _np

        f = int(_np.prod(_bd.factors(self.blocked)))
        inplanes = xb.shape[-1] // f
        needs_proj = self.stride != 1 or inplanes != self.features

        fused = (_bd.bd_fused_enabled() and self.stride == 1
                 and (inplanes * f) % 128 == 0 and (self.features * f) % 128 == 0
                 and int(xb.shape[1]) >= 3)
        if fused:
            # GN+ReLU+pads ride the conv kernels' band path (ops/pallas/bdx);
            # the two convs chain through a canvas with zero repacks.
            # Identical math + param tree; inference-only gate.
            dims_s = tuple(int(v) for v in xb.shape[1:4])
            wb = _bd.chain_wb(dims_s[2])
            fold1 = GroupNormBD(self.group, blocked=self.blocked, packing="s",
                                name="gn1")(xb, fold=True)
            c0 = _bd.to_canvas(xb, wb)
            c1 = WSConv3dBD(self.features, stride=1,
                            weight_std=self.weight_std, blocked=self.blocked,
                            packing="s", name="conv1")(
                c0, gn_fold=fold1, canvas=(dims_s, wb))
            dims_a = (dims_s[0],
                      dims_s[1] - 1 if self.blocked[1] else dims_s[1],
                      dims_s[2] - 1 if self.blocked[2] else dims_s[2])
            fold2 = GroupNormBD(self.group, blocked=self.blocked, packing="a",
                                name="gn2")(c1, fold=True, canvas=(dims_a, wb))
            c2 = WSConv3dBD(self.features, stride=1,
                            weight_std=self.weight_std, blocked=self.blocked,
                            packing="a", name="conv2")(
                c1, gn_fold=fold2, canvas=(dims_a, wb),
                res=None if needs_proj else c0)
            out = _bd.from_canvas(c2, dims_s[1], dims_s[2], wb)
            if needs_proj:
                return out + GNReLUConvBD(
                    self.features, num_groups=self.group, stride=1,
                    weight_std=self.weight_std, use_bias=False,
                    blocked=self.blocked, packing="s", name="downsample")(xb)
            return out  # residual added in-kernel (res=c0)

        out = GroupNormBD(self.group, blocked=self.blocked, packing="s",
                          relu=True, name="gn1")(xb)
        out = WSConv3dBD(self.features, stride=self.stride,
                         weight_std=self.weight_std, blocked=self.blocked,
                         packing="s", name="conv1")(out)
        if self.stride == 1:
            out = GroupNormBD(self.group, blocked=self.blocked, packing="a",
                              relu=True, name="gn2")(out)
            out = WSConv3dBD(self.features, stride=1,
                             weight_std=self.weight_std, blocked=self.blocked,
                             packing="a", name="conv2")(out)
        else:
            out_blocked = _bd.blocked_for(self.features)
            if any(out_blocked):
                out = _bd.pack(out, out_blocked)
                out = GroupNormBD(self.group, blocked=out_blocked,
                                  packing="a", relu=True, name="gn2")(out)
                out = WSConv3dBD(self.features, stride=1,
                                 weight_std=self.weight_std,
                                 blocked=out_blocked, packing="a",
                                 name="conv2")(out)
            else:
                out = GroupNorm(self.group, relu=True, name="gn2")(out)
                out = WSConv3d(self.features, stride=1, padding=1,
                               weight_std=self.weight_std, name="conv2")(out)

        residual = xb
        if needs_proj:
            residual = GNReLUConvBD(
                self.features, num_groups=self.group, stride=self.stride,
                weight_std=self.weight_std, use_bias=False,
                blocked=self.blocked, packing="s", name="downsample")(xb)
            if self.stride != 1:
                out_blocked = _bd.blocked_for(self.features)
                if any(out_blocked):
                    residual = _bd.pack_shifted(residual, out_blocked)
        return out + residual


class ResStageBD(nn.Module):
    """:class:`ResStage` on mixed-axis blocked tensors. With stride=2 the
    first block transitions to the features' own layout; the remaining
    blocks run there."""

    features: int
    blocks: int
    stride: int = 1
    group: int = 16
    weight_std: bool = True
    blocked: Sequence[bool] = (False, True, True)

    @nn.compact
    def __call__(self, xb):
        x = NoBottleneckBD(self.features, stride=self.stride, group=self.group,
                           weight_std=self.weight_std, blocked=self.blocked,
                           name="block0")(xb)
        nxt = _bd.blocked_for(self.features) if self.stride != 1 else self.blocked
        for i in range(1, self.blocks):
            if any(nxt):
                x = NoBottleneckBD(self.features, stride=1, group=self.group,
                                   weight_std=self.weight_std, blocked=nxt,
                                   name=f"block{i}")(x)
            else:
                x = NoBottleneck(self.features, stride=1, group=self.group,
                                 weight_std=self.weight_std,
                                 name=f"block{i}")(x)
        return x
