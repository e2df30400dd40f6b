"""The 3D U-Net family, channels-last flax modules.

Flagship: :class:`UNet3DFEAM` — the reference's trained segmenter
``unet3D_with_feam3`` (unet3D.py:938-1190) and its eval twin ``feam2``
(:721-936) unified behind an explicit functional token state:

- ``token_update='post'`` == feam3: tokens are consumed detached; the caller
  updates them after the step with :func:`~multimodal_pl_tpu.models.tokens.renew_tokens`.
- ``token_update='pre'`` == feam2/feam: tokens are EMA-updated from the decoder
  features *before* each EAM call, and the updated tokens are returned.

Ablation variants: :class:`UNet3DDeepSup` (unet3D.py:280-429),
:class:`UNet3DEAM` (:431-582 and the truncated ``_baseline`` :1370-1504),
:class:`UNet3DBaseline` (:584-718), and the DoDNet-style dynamic-head
:class:`UNet3DDynHead` (:1625-1806).

Structure (layers=(1,2,2,2,2), base=32):
  conv1 1->32; enc stages 32,64,128,256,256 (stride-2 from stage 1);
  GN-ReLU-1x1 fusion; decoder: x2 trilinear upsample + additive skip +
  1-block ResStage at 128/64/32/32; deep-sup heads + EAM at the first three
  decoder scales; final GN-ReLU-1x1 classifier.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_pl_tpu.models.blocks import (
    GNReLUConv,
    GNReLUConvS2D,
    ResStage,
    ResStageS2D,
    WSConv3d,
    WSConv3dS2D,
    torch_init,
)
from multimodal_pl_tpu.models.eam import EAM, attn_to_map
from multimodal_pl_tpu.models.tokens import masked_class_means
from multimodal_pl_tpu.ops.resize import resize_nearest, upsample_trilinear
from multimodal_pl_tpu.ops.s2d import (
    depth_to_space_shifted,
    s2d_upsample_trilinear,
    space_to_depth,
)


class Encoder(nn.Module):
    """conv1 + 5 residual stages (unet3D.py:949-955). Returns skips + bottom.

    remat=True checkpoints each stage (recompute activations in the backward
    pass) — trades ~33% more FLOPs for the HBM needed to fit full 64x192x192
    patches; full-res stages pad 4x under TPU (8,128) tiling, so memory, not
    compute, is the training-step ceiling.
    """

    layers: Sequence[int] = (1, 2, 2, 2, 2)
    base: int = 32
    weight_std: bool = True
    remat: bool = False
    s2d: bool = False
    bd: bool = False

    @nn.compact
    def __call__(self, x):
        """With s2d=True (requires even D/H/W), the full-resolution stages run
        in the space-to-depth block domain (ops/s2d.py) and skip0 is returned
        as a block tensor (B, D/2, H/2, W/2, 8*base) — on TPU this fills the
        128-lane minor dim that C=32 would pad 4x. Identical params and math
        either way (tests/test_s2d.py).

        With bd=True (round-5 conv engine, overrides s2d), every stage runs
        on its minimal-inflation mixed-axis layout (ops/bd.py): C=32 stages
        H,W-blocked, C=64 stages W-blocked, C>=128 voxel; skip0 is an
        H,W-blocked SHIFTED tensor (B, D, H/2+1, W/2+1, 4*base) and skip1 a
        W-blocked SHIFTED tensor. Identical params and math
        (tests/test_bd.py)."""
        b = self.base
        stage = nn.remat(ResStage) if self.remat else ResStage
        if self.bd:
            from multimodal_pl_tpu.models.blocks import ResStageBD, WSConv3dBD
            from multimodal_pl_tpu.ops import bd as _bd

            hw2 = (False, True, True)
            stage_bd = nn.remat(ResStageBD) if self.remat else ResStageBD
            xb = _bd.pack(x, hw2)  # aligned
            xb = WSConv3dBD(b, stride=1, weight_std=self.weight_std,
                            blocked=hw2, packing="a", name="conv1")(xb)
            xb = stage_bd(b, self.layers[0], stride=1,
                          weight_std=self.weight_std, blocked=hw2,
                          name="layer0")(xb)
            skip0 = xb  # shifted hw2
            x = stage_bd(b * 2, self.layers[1], stride=2,
                         weight_std=self.weight_std, blocked=hw2,
                         name="layer1")(xb)
            skip1 = x  # shifted w1
            x = stage_bd(b * 4, self.layers[2], stride=2,
                         weight_std=self.weight_std,
                         blocked=_bd.blocked_for(b * 2), name="layer2")(x)
            skip2 = x  # voxel (C=128)
            x = stage(b * 8, self.layers[3], stride=2,
                      weight_std=self.weight_std, name="layer3")(x)
            skip3 = x
            x = stage(b * 8, self.layers[4], stride=2,
                      weight_std=self.weight_std, name="layer4")(x)
            x = GNReLUConv(b * 8, num_groups=16, weight_std=self.weight_std,
                           use_bias=False, name="fusion")(x)
            return (skip0, skip1, skip2, skip3), x
        if self.s2d:
            stage_s2d = nn.remat(ResStageS2D) if self.remat else ResStageS2D
            xb = space_to_depth(x)  # aligned packing
            # a2s stem: output (and everything below until the stride-2 exit)
            # uses the SHIFTED packing
            xb = WSConv3dS2D(b, stride=1, weight_std=self.weight_std, packing="a",
                             name="conv1")(xb)
            xb = stage_s2d(b, self.layers[0], stride=1, weight_std=self.weight_std,
                           name="layer0")(xb)
            skip0 = xb  # shifted block domain
            x = stage_s2d(b * 2, self.layers[1], stride=2, weight_std=self.weight_std,
                          name="layer1")(xb)
        else:
            x = WSConv3d(b, stride=1, padding=1, weight_std=self.weight_std, name="conv1")(x)
            x = stage(b, self.layers[0], stride=1, weight_std=self.weight_std, name="layer0")(x)
            skip0 = x
            x = stage(b * 2, self.layers[1], stride=2, weight_std=self.weight_std,
                      name="layer1")(x)
        skip1 = x
        x = stage(b * 4, self.layers[2], stride=2, weight_std=self.weight_std, name="layer2")(x)
        skip2 = x
        x = stage(b * 8, self.layers[3], stride=2, weight_std=self.weight_std, name="layer3")(x)
        skip3 = x
        x = stage(b * 8, self.layers[4], stride=2, weight_std=self.weight_std, name="layer4")(x)
        x = GNReLUConv(b * 8, num_groups=16, weight_std=self.weight_std, use_bias=False,
                       name="fusion")(x)
        return (skip0, skip1, skip2, skip3), x


class UNet3DFEAM(nn.Module):
    """Flagship FEAM segmenter (reference unet3D_with_feam3 / feam2)."""

    layers: Sequence[int] = (1, 2, 2, 2, 2)
    num_classes: int = 14
    weight_std: bool = True
    use_cm: Sequence[bool] = (True, True, True)
    deep_up: bool = False
    base: int = 32
    token_update: str = "post"  # 'post' (feam3) | 'pre' (feam2)
    token_alpha: float = 0.01
    remat: bool = False
    s2d: bool = True
    bd: bool = False  # round-5 mixed-axis engine (ops/bd.py); overrides s2d

    @nn.compact
    def __call__(self, x, tokens: Dict[str, jax.Array], mask: jax.Array | None = None):
        """x: (B, D, H, W, 1); tokens: {'t1': (C-1,128), 't2': (C-1,64), 't3': (C-1,32)}.

        mask: (B, D, H, W) labels — only needed for token_update='pre'.
        Returns (logits, attn_maps, deep_maps, features, new_tokens).

        s2d=True routes the full-resolution stages (encoder stem/layer0 and the
        x1 decoder/classifier) through the space-to-depth block domain when the
        spatial dims are even — the TPU layout fix for C=32 lane padding; the
        parameter tree and the math are identical (tests/test_s2d.py). Odd
        shapes fall back to the voxel path automatically.
        """
        use_bd = (self.bd and int(x.shape[2]) % 4 == 0
                  and int(x.shape[3]) % 8 == 0)
        use_s2d = (not use_bd and self.s2d
                   and all(int(s) % 2 == 0 for s in x.shape[1:4]))
        skips, x = Encoder(self.layers, self.base, self.weight_std, self.remat,
                           s2d=use_s2d, bd=use_bd, name="encoder")(x)
        skip0, skip1, skip2, skip3 = skips
        nc = self.num_classes
        b = self.base

        attn_maps: List[jax.Array] = []
        deep_maps: List[jax.Array] = []
        features: List[jax.Array] = []
        new_tokens = dict(tokens)

        full_spatial = (x.shape[1] * 16, x.shape[2] * 16, x.shape[3] * 16)

        dec_stage = nn.remat(ResStage) if self.remat else ResStage

        def decode(x, skip, feat, blocks, name):
            x = upsample_trilinear(x, 2)
            x = x + skip
            return dec_stage(feat, blocks, stride=1, weight_std=self.weight_std, name=name)(x)

        def maybe_pre_update(x, key):
            if self.token_update == "pre" and mask is not None:
                m = resize_nearest(mask[..., None].astype(x.dtype), x.shape[1:4])[..., 0]
                means, counts = masked_class_means(jax.lax.stop_gradient(x), m, nc - 1)
                tok = new_tokens[key]
                upd = tok * (1.0 - self.token_alpha) + self.token_alpha * means.astype(tok.dtype)
                new_tokens[key] = jnp.where((counts > 0)[:, None], upd, tok)

        def run_eam(x, key, dim, eam_name, up_factor):
            x_t = x.reshape(x.shape[0], -1, x.shape[-1])
            tok = jax.lax.stop_gradient(new_tokens[key]).astype(x.dtype)
            _, attn = EAM(dim, num_heads=4, name=eam_name)(x_t, tok[None])
            amap = attn_to_map(attn, x.shape[1:4])
            if self.deep_up:
                amap = jnp.asarray(
                    jax.image.resize(
                        amap, (amap.shape[0], *full_spatial, amap.shape[-1]), method="trilinear"
                    )
                )
            attn_maps.append(amap)

        if use_bd:
            from multimodal_pl_tpu.models.blocks import GNReLUConvBD, ResStageBD
            from multimodal_pl_tpu.ops import bd as _bd

            hw2, w1 = (False, True, True), (False, False, True)
            stage_bd = nn.remat(ResStageBD) if self.remat else ResStageBD

        # x8 scale (features b*4 = 128)
        x = decode(x, skip3, b * 4, 1, "x8_resb")
        deep_maps.append(GNReLUConv(nc, num_groups=16, name="deepout1")(x))
        features.append(jax.lax.stop_gradient(x))
        maybe_pre_update(x, "t1")
        if self.use_cm[0]:
            run_eam(x, "t1", b * 4, "eam84", 8)

        # x4 scale (features b*2 = 64; bd: W-blocked stage, voxel view for
        # the deep-sup/EAM consumers)
        if use_bd:
            xi = upsample_trilinear(x, 2) + skip2
            xb4 = _bd.pack_shifted(xi, w1)
            xb4 = stage_bd(b * 2, 1, stride=1, weight_std=self.weight_std,
                           blocked=w1, name="x4_resb")(xb4)
            x = _bd.unpack_shifted(xb4, w1)
        else:
            x = decode(x, skip2, b * 2, 1, "x4_resb")
        deep_maps.append(GNReLUConv(nc, num_groups=16, name="deepout2")(x))
        features.append(jax.lax.stop_gradient(x))
        maybe_pre_update(x, "t2")
        if self.use_cm[1]:
            run_eam(x, "t2", b * 2, "eam42", 4)

        # x2 scale (features b = 32; bd: H,W-blocked stage)
        if use_bd:
            xi = upsample_trilinear(x, 2) + _bd.unpack_shifted(skip1, w1)
            xb2 = _bd.pack_shifted(xi, hw2)
            xb2 = stage_bd(b, 1, stride=1, weight_std=self.weight_std,
                           blocked=hw2, name="x2_resb")(xb2)
            x = _bd.unpack_shifted(xb2, hw2)
        else:
            x = decode(x, skip1, b, 1, "x2_resb")
        deep_maps.append(GNReLUConv(nc, num_groups=16, name="deepout3")(x))
        features.append(jax.lax.stop_gradient(x))
        maybe_pre_update(x, "t3")
        if self.use_cm[2]:
            run_eam(x, "t3", b, "eam21", 2)

        # x1 scale
        if use_bd:
            xb = _bd.bd_upsample_trilinear(x, hw2, packing="s") + skip0
            xb = stage_bd(b, 1, stride=1, weight_std=self.weight_std,
                          blocked=hw2, name="x1_resb")(xb)
            logits = _bd.unpack_shifted(
                GNReLUConvBD(nc, num_groups=16, blocked=hw2, packing="s",
                             name="precls")(xb), hw2)
        elif use_s2d:
            xb = s2d_upsample_trilinear(x, packing="s") + skip0
            stage_s2d = nn.remat(ResStageS2D) if self.remat else ResStageS2D
            xb = stage_s2d(b, 1, stride=1, weight_std=self.weight_std, name="x1_resb")(xb)
            logits = depth_to_space_shifted(
                GNReLUConvS2D(nc, num_groups=16, packing="s", name="precls")(xb))
        else:
            x = decode(x, skip0, b, 1, "x1_resb")
            logits = GNReLUConv(nc, num_groups=16, name="precls")(x)

        return logits, attn_maps, deep_maps, features, new_tokens


class UNet3DDeepSup(nn.Module):
    """Deep-supervision-only ablation (reference unet3D_with_deepsup :280-429)."""

    layers: Sequence[int] = (1, 2, 2, 2, 2)
    num_classes: int = 14
    weight_std: bool = True
    base: int = 32

    @nn.compact
    def __call__(self, x):
        skips, x = Encoder(self.layers, self.base, self.weight_std, name="encoder")(x)
        skip0, skip1, skip2, skip3 = skips
        nc, b = self.num_classes, self.base
        deep = []

        def decode(x, skip, feat, name):
            x = upsample_trilinear(x, 2)
            return ResStage(feat, 1, stride=1, weight_std=self.weight_std, name=name)(x + skip)

        x = decode(x, skip3, b * 4, "x8_resb")
        deep.append(GNReLUConv(nc, num_groups=16, name="deepout1")(x))
        x = decode(x, skip2, b * 2, "x4_resb")
        deep.append(GNReLUConv(nc, num_groups=16, name="deepout2")(x))
        x = decode(x, skip1, b, "x2_resb")
        deep.append(GNReLUConv(nc, num_groups=16, name="deepout3")(x))
        x = decode(x, skip0, b, "x1_resb")
        logits = GNReLUConv(nc, num_groups=16, name="precls")(x)
        return logits, deep


class UNet3DEAM(nn.Module):
    """Cascaded learnable class tokens (reference unet3D_with_eam :431-582;
    num_eams=2 gives the truncated unet3D_with_eam_baseline :1370-1504)."""

    layers: Sequence[int] = (1, 2, 2, 2, 2)
    num_classes: int = 14
    weight_std: bool = True
    base: int = 32
    num_eams: int = 3

    @nn.compact
    def __call__(self, x):
        skips, x = Encoder(self.layers, self.base, self.weight_std, name="encoder")(x)
        skip0, skip1, skip2, skip3 = skips
        nc, b = self.num_classes, self.base
        attn_maps = []

        token = self.param("class_token", nn.initializers.normal(1.0), (nc, b * 4), jnp.float32)
        cm = token[None].astype(x.dtype)

        def decode(x, skip, feat, name):
            x = upsample_trilinear(x, 2)
            return ResStage(feat, 1, stride=1, weight_std=self.weight_std, name=name)(x + skip)

        def run(x, cm, dim, name):
            x_t = x.reshape(x.shape[0], -1, x.shape[-1])
            cm, attn = EAM(dim, num_heads=4, name=name)(x_t, cm)
            attn_maps.append(attn_to_map(attn, x.shape[1:4]))
            return cm

        x = decode(x, skip3, b * 4, "x8_resb")
        cm = run(x, cm, b * 4, "eam84")
        cm = _Linear(b * 2, name="linear84_2_42")(cm)

        x = decode(x, skip2, b * 2, "x4_resb")
        if self.num_eams >= 2:
            cm = run(x, cm, b * 2, "eam42")
            if self.num_eams >= 3:
                cm = _Linear(b, name="linear42_2_21")(cm)

        x = decode(x, skip1, b, "x2_resb")
        if self.num_eams >= 3:
            cm = run(x, cm, b, "eam21")

        x = decode(x, skip0, b, "x1_resb")
        logits = GNReLUConv(nc, num_groups=16, name="precls")(x)
        return logits, cm, attn_maps


class _Linear(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", torch_init, (x.shape[-1], self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        return x @ w.astype(x.dtype) + b.astype(x.dtype)


class UNet3DBaseline(nn.Module):
    """Plain residual U-Net (reference unet3D_baseline :584-718)."""

    layers: Sequence[int] = (1, 2, 2, 2, 2)
    num_classes: int = 14
    weight_std: bool = True
    base: int = 32

    @nn.compact
    def __call__(self, x):
        skips, x = Encoder(self.layers, self.base, self.weight_std, name="encoder")(x)
        skip0, skip1, skip2, skip3 = skips
        b = self.base

        def decode(x, skip, feat, name):
            x = upsample_trilinear(x, 2)
            return ResStage(feat, 1, stride=1, weight_std=self.weight_std, name=name)(x + skip)

        x = decode(x, skip3, b * 4, "x8_resb")
        x = decode(x, skip2, b * 2, "x4_resb")
        x = decode(x, skip1, b, "x2_resb")
        x = decode(x, skip0, b, "x1_resb")
        return GNReLUConv(self.num_classes, num_groups=16, name="precls")(x)


class UNet3DDynHead(nn.Module):
    """DoDNet-style task-conditioned dynamic head (reference unet3D :1625-1806).

    The controller generates 162 params = two 8->8 1x1 convs + one 8->2,
    applied per-sample as a grouped conv (heads_forward :1720-1732). Here the
    grouped 1x1x1 convs become per-sample einsums — the same math, but XLA
    maps it onto batched MXU matmuls instead of grouped-conv kernels.
    """

    layers: Sequence[int] = (1, 2, 2, 2, 2)
    num_tasks: int = 7
    weight_std: bool = True
    base: int = 32

    @nn.compact
    def __call__(self, x, task_id):
        skips, bottom = Encoder(self.layers, self.base, self.weight_std, name="encoder")(x)
        skip0, skip1, skip2, skip3 = skips
        b = self.base

        # task conditioning: GN -> ReLU -> GAP(bottom) ++ one-hot(task) -> controller
        # (unet3D.py:1659-1664, 1754-1759)
        from multimodal_pl_tpu.models.blocks import GroupNorm

        g = GroupNorm(16, name="gap_gn")(bottom)
        pooled = jnp.mean(nn.relu(g), axis=(1, 2, 3))
        onehot = jax.nn.one_hot(task_id, self.num_tasks, dtype=pooled.dtype)
        cond = jnp.concatenate([pooled, onehot], axis=-1)
        params = _Linear(162, name="controller")(cond)  # 1x1x1 conv == Linear

        xd = upsample_trilinear(bottom, 2) + skip3
        xd = ResStage(b * 4, 1, stride=1, weight_std=self.weight_std, name="x8_resb")(xd)
        xd = upsample_trilinear(xd, 2) + skip2
        xd = ResStage(b * 2, 1, stride=1, weight_std=self.weight_std, name="x4_resb")(xd)
        xd = upsample_trilinear(xd, 2) + skip1
        xd = ResStage(b, 1, stride=1, weight_std=self.weight_std, name="x2_resb")(xd)
        xd = upsample_trilinear(xd, 2) + skip0
        xd = ResStage(b, 1, stride=1, weight_std=self.weight_std, name="x1_resb")(xd)
        head_in = GNReLUConv(8, num_groups=16, name="precls")(xd)  # (B, D, H, W, 8)

        # parse dynamic params (weights 64+64+16, biases 8+8+2 -> 162)
        w1 = params[:, 0:64].reshape(-1, 8, 8)
        w2 = params[:, 64:128].reshape(-1, 8, 8)
        w3 = params[:, 128:144].reshape(-1, 8, 2)
        b1 = params[:, 144:152]
        b2 = params[:, 152:160]
        b3 = params[:, 160:162]

        h = jnp.einsum("bdhwc,bco->bdhwo", head_in, w1) + b1[:, None, None, None, :]
        h = nn.relu(h)
        h = jnp.einsum("bdhwc,bco->bdhwo", h, w2) + b2[:, None, None, None, :]
        h = nn.relu(h)
        logits = jnp.einsum("bdhwc,bco->bdhwo", h, w3) + b3[:, None, None, None, :]
        return logits
