"""EAM: class-token cross-attention over flattened voxel features.

Reference: unet3D.py:142-212 (EAM), :76-140 (EAM_identity), :214-278 (EAM_bk).

Class tokens are the queries; flattened voxel features are keys/values. The
module returns both the updated tokens and the *raw* (pre-scale, pre-softmax)
attention scores — downstream code treats the head-averaged raw scores as a
per-class soft segmentation map (unet3D.py:1136).

The score matmul is (Nt x C) @ (C x N) with Nt=13 — a skinny matmul the MXU
eats whole; no flash-style tiling is needed because the token axis is tiny and
the full score matrix is only heads * 13 * N floats.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_pl_tpu.models.blocks import torch_init
from multimodal_pl_tpu.ops.norm import layer_norm


class _LayerNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        return layer_norm(x, scale.astype(x.dtype), bias.astype(x.dtype), self.eps)


class _Dense(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", torch_init, (x.shape[-1], self.features), jnp.float32)
        y = x @ w.astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            y = y + b.astype(x.dtype)
        return y


def _attend(q, k, v, scale, *, scale_before_softmax: bool):
    """q: (B, h, Nt, dh); k, v: (B, h, N, dh). Returns (out (B, Nt, C), raw attn)."""
    b, h, nt, dh = q.shape
    if not scale_before_softmax:
        q = q * scale
    attn = jnp.einsum("bhtd,bhnd->bhtn", q, k, preferred_element_type=jnp.float32)
    scores = attn * scale if scale_before_softmax else attn
    attnf = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhtn,bhnd->bhtd", attnf, v, preferred_element_type=jnp.float32)
    out = out.astype(v.dtype).transpose(0, 2, 1, 3).reshape(b, nt, h * dh)
    return out, attn


def _split_heads(x, num_heads):
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


class EAM(nn.Module):
    """Pre-norm cross-attention (reference unet3D.py:142-212).

    norm2 is shared between the voxel features and the output projection
    branch, exactly as in the reference (self.norm2 used at :191 and :206).
    Softmax is over scaled scores; the returned map is the unscaled raw score.
    """

    dim: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x, tokens):
        # x: (B, N, C) voxels; tokens: (B or 1, Nt, C) — a singleton token
        # batch broadcasts over the voxel batch (torch matmul semantics of the
        # reference's class_token.view(1, Nt, C) at unet3D.py:1134)
        if tokens.shape[0] != x.shape[0]:
            tokens = jnp.broadcast_to(tokens, (x.shape[0], *tokens.shape[1:]))
        scale = (self.dim // self.num_heads) ** -0.5
        norm2 = _LayerNorm(name="norm2")
        xn = norm2(x)
        tn = _LayerNorm(name="norm3")(tokens)

        kv = _Dense(self.dim * 2, use_bias=False, name="kv")(xn)
        k, v = jnp.split(kv, 2, axis=-1)
        q = _Dense(self.dim, use_bias=False, name="q")(tn)

        out, attn = _attend(
            _split_heads(q, self.num_heads),
            _split_heads(k, self.num_heads),
            _split_heads(v, self.num_heads),
            scale,
            scale_before_softmax=True,
        )
        out = _Dense(self.dim, name="proj")(norm2(out)) + out
        return out, attn


class EAMBK(nn.Module):
    """Un-normed variant with biased qkv (reference unet3D.py:214-278)."""

    dim: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x, tokens):
        if tokens.shape[0] != x.shape[0]:
            tokens = jnp.broadcast_to(tokens, (x.shape[0], *tokens.shape[1:]))
        scale = (self.dim // self.num_heads) ** -0.5
        kv = _Dense(self.dim * 2, name="kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)
        q = _Dense(self.dim, name="q")(tokens)
        out, attn = _attend(
            _split_heads(q, self.num_heads),
            _split_heads(k, self.num_heads),
            _split_heads(v, self.num_heads),
            scale,
            scale_before_softmax=False,
        )
        out = _Dense(self.dim, name="proj")(_LayerNorm(name="norm2")(out)) + out
        return out, attn


class EAMIdentity(nn.Module):
    """No-projection variant: k=v=x, q=tokens (reference unet3D.py:76-140)."""

    dim: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x, tokens):
        if tokens.shape[0] != x.shape[0]:
            tokens = jnp.broadcast_to(tokens, (x.shape[0], *tokens.shape[1:]))
        scale = (self.dim // self.num_heads) ** -0.5
        out, attn = _attend(
            _split_heads(tokens, self.num_heads),
            _split_heads(x, self.num_heads),
            _split_heads(x, self.num_heads),
            scale,
            scale_before_softmax=False,
        )
        out = _Dense(self.dim, name="proj")(_LayerNorm(name="norm2")(out)) + out
        return out, attn


def attn_to_map(attn: jax.Array, spatial) -> jax.Array:
    """Head-averaged raw scores -> per-class volume map (unet3D.py:1136).

    attn: (B, h, Nt, N) with N = prod(spatial) -> (B, *spatial, Nt)
    channels-last to match the rest of the framework.
    """
    b, _, nt, n = attn.shape
    m = attn.mean(axis=1)  # (B, Nt, N)
    m = m.transpose(0, 2, 1).reshape(b, *spatial, nt)
    return m
