"""EAM cross-attention parity vs a torch reimplementation of the same math."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from multimodal_pl_tpu.models.eam import EAM, attn_to_map


def torch_eam(x, tokens, wkv, wq, wproj, bproj, ln2_w, ln2_b, ln3_w, ln3_b, num_heads=4):
    """The reference EAM forward math (unet3D.py:186-212), torch tensors."""
    B, N, C = x.shape
    _, Nt, _ = tokens.shape
    scale = (C // num_heads) ** -0.5
    ln2 = lambda t: torch.nn.functional.layer_norm(t, (C,), ln2_w, ln2_b, 1e-5)
    ln3 = lambda t: torch.nn.functional.layer_norm(t, (C,), ln3_w, ln3_b, 1e-5)
    xn = ln2(x)
    tn = ln3(tokens)
    kv = xn @ wkv.T  # (B, N, 2C)
    kv = kv.reshape(B, N, 2, num_heads, C // num_heads).permute(2, 0, 3, 1, 4)
    k, v = kv[0], kv[1]
    q = (tn @ wq.T).reshape(B, Nt, num_heads, C // num_heads).permute(0, 2, 1, 3)
    attn = q @ k.transpose(-2, -1)
    attnf = torch.softmax(attn * scale, dim=-1)
    out = (attnf @ v).transpose(1, 2).reshape(B, Nt, C)
    out = ln2(out) @ wproj.T + bproj + out
    return out, attn


def test_eam_matches_torch(rng):
    C, H, B, N, Nt = 32, 4, 1, 24, 13
    x = rng.standard_normal((B, N, C)).astype(np.float32)
    tok = rng.standard_normal((B, Nt, C)).astype(np.float32)

    model = EAM(dim=C, num_heads=H)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(tok))
    out, attn = model.apply(params, jnp.asarray(x), jnp.asarray(tok))

    p = params["params"]
    t = lambda a: torch.from_numpy(np.asarray(a))
    want_out, want_attn = torch_eam(
        t(x),
        t(tok),
        wkv=t(p["kv"]["kernel"]).T,
        wq=t(p["q"]["kernel"]).T,
        wproj=t(p["proj"]["kernel"]).T,
        bproj=t(p["proj"]["bias"]),
        ln2_w=t(p["norm2"]["scale"]),
        ln2_b=t(p["norm2"]["bias"]),
        ln3_w=t(p["norm3"]["scale"]),
        ln3_b=t(p["norm3"]["bias"]),
        num_heads=H,
    )
    np.testing.assert_allclose(np.asarray(out), want_out.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(attn), want_attn.numpy(), rtol=1e-4, atol=1e-4)


def test_attn_to_map_shape():
    attn = jnp.ones((2, 4, 13, 2 * 3 * 4))
    m = attn_to_map(attn, (2, 3, 4))
    assert m.shape == (2, 2, 3, 4, 13)
    # mean over heads of ones is ones
    np.testing.assert_allclose(np.asarray(m), 1.0)


def test_eam_token_broadcast_over_batch(rng):
    """Singleton token batch must broadcast over a >1 voxel batch (the
    sliding-window tile-batch case; regression for torch matmul semantics)."""
    C = 32
    x = jnp.asarray(rng.standard_normal((3, 10, C)).astype(np.float32))
    tok = jnp.asarray(rng.standard_normal((1, 13, C)).astype(np.float32))
    model = EAM(dim=C, num_heads=4)
    params = model.init(jax.random.PRNGKey(0), x, tok)
    out, attn = model.apply(params, x, tok)
    assert out.shape == (3, 13, C)
    assert attn.shape == (3, 4, 13, 10)
    # each batch element sees the same tokens; different x -> different outputs
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))
