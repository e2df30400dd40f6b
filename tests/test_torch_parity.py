"""Whole-model forward parity: flax FEAM vs a torch implementation of the
reference network running the exported weights.

This is the strongest parity statement in the suite: export our params to the
reference state_dict layout (train/torch_import.py), execute the reference
feam3 forward math in torch (written below from the architecture spec:
unet3D.py:938-1190), and require logits + deep-sup heads + attention maps to
match to f32 tolerance. It simultaneously pins the model and both directions
of the checkpoint converter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from multimodal_pl_tpu.models import UNet3DFEAM, init_class_tokens
from multimodal_pl_tpu.train.torch_import import (
    feam_state_dict_to_params,
    params_to_feam_state_dict,
)

NC = 14
D, H, W = 16, 32, 32


# ---------------------------------------------------------------------------
# torch reference forward (functional, from the architecture spec)
# ---------------------------------------------------------------------------


def t_ws_conv(x, w, stride=1, padding=1):
    m = w.mean(dim=1, keepdim=True).mean(dim=2, keepdim=True).mean(dim=3, keepdim=True).mean(
        dim=4, keepdim=True)
    w = w - m
    std = torch.sqrt(torch.var(w.reshape(w.size(0), -1), dim=1) + 1e-12).view(-1, 1, 1, 1, 1)
    return F.conv3d(x, w / std, stride=stride, padding=padding)


def t_gn(x, weight, bias, groups=16):
    return F.group_norm(x, groups, weight, bias, 1e-5)


def t_block(x, sd, prefix, groups=16):
    out = t_gn(x, sd[f"{prefix}.gn1.weight"], sd[f"{prefix}.gn1.bias"], groups)
    out = F.relu(out)
    out = t_ws_conv(out, sd[f"{prefix}.conv1.weight"],
                    stride=2 if f"{prefix}.downsample.0.weight" in sd and _is_strided(sd, prefix) else 1)
    out = t_gn(out, sd[f"{prefix}.gn2.weight"], sd[f"{prefix}.gn2.bias"], groups)
    out = F.relu(out)
    out = t_ws_conv(out, sd[f"{prefix}.conv2.weight"])
    residual = x
    if f"{prefix}.downsample.0.weight" in sd:
        r = t_gn(x, sd[f"{prefix}.downsample.0.weight"], sd[f"{prefix}.downsample.0.bias"], groups)
        r = F.relu(r)
        residual = t_ws_conv(r, sd[f"{prefix}.downsample.2.weight"],
                             stride=2 if _is_strided(sd, prefix) else 1, padding=0)
    return out + residual


def _is_strided(sd, prefix):
    # encoder layers 1-4 block 0 stride 2; everything else stride 1
    return prefix.split(".")[0] in ("layer1", "layer2", "layer3", "layer4") and prefix.endswith(".0")


def t_stage(x, sd, name, blocks):
    for i in range(blocks):
        x = t_block(x, sd, f"{name}.{i}")
    return x


def t_seq_head(x, sd, prefix, groups=16):
    out = t_gn(x, sd[f"{prefix}.0.weight"], sd[f"{prefix}.0.bias"], groups)
    out = F.relu(out)
    w, b = sd[f"{prefix}.2.weight"], sd.get(f"{prefix}.2.bias")
    return F.conv3d(out, w, b, padding=0)


def t_fusion(x, sd):
    out = t_gn(x, sd["fusionConv.0.weight"], sd["fusionConv.0.bias"])
    out = F.relu(out)
    return t_ws_conv(out, sd["fusionConv.2.weight"], padding=0)


def t_eam(x_t, tok, sd, prefix, num_heads=4):
    B, N, C = x_t.shape
    Nt = tok.shape[1]
    scale = (C // num_heads) ** -0.5
    ln = lambda t, p: F.layer_norm(t, (C,), sd[f"{prefix}.{p}.weight"], sd[f"{prefix}.{p}.bias"], 1e-5)
    xn = ln(x_t, "norm2")
    tn = ln(tok, "norm3")
    kv = xn @ sd[f"{prefix}.kv.weight"].T
    kv = kv.reshape(B, N, 2, num_heads, C // num_heads).permute(2, 0, 3, 1, 4)
    k, v = kv[0], kv[1]
    q = (tn @ sd[f"{prefix}.q.weight"].T).reshape(B, Nt, num_heads, C // num_heads).permute(0, 2, 1, 3)
    attn = q @ k.transpose(-2, -1)
    attnf = torch.softmax(attn * scale, dim=-1)
    out = (attnf @ v).transpose(1, 2).reshape(B, Nt, C)
    out = ln(out, "norm2") @ sd[f"{prefix}.proj.weight"].T + sd[f"{prefix}.proj.bias"] + out
    return out, attn


def torch_feam2_forward_train(x, sd, tokens, mask, alpha=0.01, layers=(1, 2, 2, 2, 2)):
    """The reference unet3D_with_feam2 TRAINING forward (unet3D.py:826-936):
    same topology as feam3, but the parameter class tokens are EMA-updated
    IN-FORWARD from the masked decoder-feature means before each EAM consumes
    them (detached). mask: (B, 1, D, H, W) integer labels. B must be 1 — the
    reference's boolean-index reshape scrambles channels for B > 1 (see
    models/tokens.py docstring). Returns (logits, attns, deeps, tokens)."""
    up = lambda t: F.interpolate(t, scale_factor=2, mode="trilinear")
    tokens = {k: v.clone() for k, v in tokens.items()}

    def ema_update(x, tok):
        # unet3D.py:854-864 (and :890-896, :920-926 at the other scales)
        for l in range(tok.shape[0]):
            if (mask == (l + 1)).sum() != 0:
                cm = F.interpolate((mask == (l + 1)).float(), size=x.shape[2:],
                                   mode="nearest").bool().repeat(1, x.shape[1], 1, 1, 1)
                if cm.sum() == 0:
                    continue
                feat = x[cm].reshape(x.shape[1], -1).mean(-1)
                tok[l] = tok[l] * (1 - alpha) + feat * alpha

    x = t_ws_conv(x, sd["conv1.weight"])
    x = t_stage(x, sd, "layer0", layers[0]); skip0 = x
    x = t_stage(x, sd, "layer1", layers[1]); skip1 = x
    x = t_stage(x, sd, "layer2", layers[2]); skip2 = x
    x = t_stage(x, sd, "layer3", layers[3]); skip3 = x
    x = t_stage(x, sd, "layer4", layers[4])
    x = t_fusion(x, sd)

    attns, deeps = [], []
    for skip, stage, deep, eam_name, tok_key, dim in (
        (skip3, "x8_resb", "deepout1", "eam84", "t1", 128),
        (skip2, "x4_resb", "deepout2", "eam42", "t2", 64),
        (skip1, "x2_resb", "deepout3", "eam21", "t3", 32),
    ):
        x = t_stage(up(x) + skip, sd, stage, 1)
        deeps.append(t_seq_head(x, sd, deep))
        ema_update(x, tokens[tok_key])
        x_t = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        _, a = t_eam(x_t, tokens[tok_key].view(1, NC - 1, dim), sd, eam_name)
        attns.append(a.mean(1).reshape(x.shape[0], NC - 1, *x.shape[2:]))

    x = t_stage(up(x) + skip0, sd, "x1_resb", 1)
    logits = t_seq_head(x, sd, "precls_conv")
    return logits, attns, deeps, tokens


def torch_feam3_forward(x, sd, tokens, layers=(1, 2, 2, 2, 2)):
    """The reference unet3D_with_feam3 training forward (unet3D.py:1095-1188)."""
    up = lambda t: F.interpolate(t, scale_factor=2, mode="trilinear")
    x = t_ws_conv(x, sd["conv1.weight"])
    x = t_stage(x, sd, "layer0", layers[0]); skip0 = x
    x = t_stage(x, sd, "layer1", layers[1]); skip1 = x
    x = t_stage(x, sd, "layer2", layers[2]); skip2 = x
    x = t_stage(x, sd, "layer3", layers[3]); skip3 = x
    x = t_stage(x, sd, "layer4", layers[4])
    x = t_fusion(x, sd)

    attns, deeps = [], []

    x = t_stage(up(x) + skip3, sd, "x8_resb", 1)
    deeps.append(t_seq_head(x, sd, "deepout1"))
    x_t = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
    _, a = t_eam(x_t, tokens["t1"].view(1, NC - 1, 128), sd, "eam84")
    attns.append(a.mean(1).reshape(x.shape[0], NC - 1, *x.shape[2:]))

    x = t_stage(up(x) + skip2, sd, "x4_resb", 1)
    deeps.append(t_seq_head(x, sd, "deepout2"))
    x_t = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
    _, a = t_eam(x_t, tokens["t2"].view(1, NC - 1, 64), sd, "eam42")
    attns.append(a.mean(1).reshape(x.shape[0], NC - 1, *x.shape[2:]))

    x = t_stage(up(x) + skip1, sd, "x2_resb", 1)
    deeps.append(t_seq_head(x, sd, "deepout3"))
    x_t = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
    _, a = t_eam(x_t, tokens["t3"].view(1, NC - 1, 32), sd, "eam21")
    attns.append(a.mean(1).reshape(x.shape[0], NC - 1, *x.shape[2:]))

    x = t_stage(up(x) + skip0, sd, "x1_resb", 1)
    logits = t_seq_head(x, sd, "precls_conv")
    return logits, attns, deeps


# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def model_and_params():
    model = UNet3DFEAM(num_classes=NC, weight_std=True, deep_up=False)
    tokens = init_class_tokens(jax.random.PRNGKey(1), NC)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, D, H, W, 1)), tokens)
    return model, params, tokens


def test_whole_model_forward_matches_torch(model_and_params, rng):
    model, params, tokens = model_and_params
    x = rng.standard_normal((1, D, H, W, 1)).astype(np.float32)

    logits, attns, deeps, _, _ = model.apply(params, jnp.asarray(x), tokens)

    sd_np = params_to_feam_state_dict(params, tokens)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_np.items()}
    t_tokens = {k: torch.from_numpy(np.asarray(tokens[k])) for k in tokens}
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))

    with torch.no_grad():
        t_logits, t_attns, t_deeps = torch_feam3_forward(xt, sd, t_tokens)

    def chk(ours_chlast, theirs_ncdhw, rtol=2e-3, atol=2e-4, name=""):
        got = np.asarray(ours_chlast).transpose(0, 4, 1, 2, 3)
        want = theirs_ncdhw.numpy()
        np.testing.assert_allclose(got, want, rtol=rtol, atol=atol, err_msg=name)

    chk(logits, t_logits, name="logits")
    for i, (a, ta) in enumerate(zip(attns, t_attns)):
        chk(a, ta, name=f"attn{i}")
    for i, (d, td) in enumerate(zip(deeps, t_deeps)):
        chk(d, td, name=f"deep{i}")


def test_feam2_pre_update_forward_matches_torch(model_and_params, rng):
    """token_update='pre' == unet3D_with_feam2 (unet3D.py:721-936), the
    variant reference users' EVAL checkpoints are saved as
    (evaluate_amos.py:571): in-forward EMA of parameter tokens, consumed
    detached post-update by each EAM. Pins logits, attention maps, deep-sup
    heads AND the updated token state against torch."""
    _, params, tokens = model_and_params
    model2 = UNet3DFEAM(num_classes=NC, weight_std=True, deep_up=False,
                        token_update="pre")
    x = rng.standard_normal((1, D, H, W, 1)).astype(np.float32)
    # labels 0..8: organs 9..13 absent, so their tokens must pass through
    # unchanged (the (mask==l+1).sum()!=0 guard)
    mask = rng.integers(0, 9, (1, D, H, W)).astype(np.int32)

    logits, attns, deeps, _, new_tokens = model2.apply(
        params, jnp.asarray(x), tokens, jnp.asarray(mask))

    sd_np = params_to_feam_state_dict(params, tokens)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_np.items()}
    t_tokens = {k: torch.from_numpy(np.asarray(tokens[k])) for k in tokens}
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    mt = torch.from_numpy(mask[:, None].astype(np.float32))

    with torch.no_grad():
        t_logits, t_attns, t_deeps, t_new = torch_feam2_forward_train(
            xt, sd, t_tokens, mt)

    def chk(ours_chlast, theirs_ncdhw, rtol=2e-3, atol=2e-4, name=""):
        got = np.asarray(ours_chlast).transpose(0, 4, 1, 2, 3)
        want = theirs_ncdhw.numpy()
        np.testing.assert_allclose(got, want, rtol=rtol, atol=atol, err_msg=name)

    chk(logits, t_logits, name="logits")
    for i, (a, ta) in enumerate(zip(attns, t_attns)):
        chk(a, ta, name=f"attn{i}")
    for i, (d, td) in enumerate(zip(deeps, t_deeps)):
        chk(d, td, name=f"deep{i}")
    for k in tokens:
        np.testing.assert_allclose(np.asarray(new_tokens[k]), t_new[k].numpy(),
                                   rtol=1e-4, atol=1e-5, err_msg=f"token {k}")
        # organs 9..13 never occur -> rows 8.. must be bit-identical
        np.testing.assert_array_equal(np.asarray(new_tokens[k])[8:],
                                      np.asarray(tokens[k])[8:],
                                      err_msg=f"untouched rows of {k}")


def test_converter_roundtrip(model_and_params):
    model, params, tokens = model_and_params
    sd = params_to_feam_state_dict(params, tokens)
    params2, tokens2 = feam_state_dict_to_params(sd)
    flat1 = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    p2 = params2["params"]
    for path, leaf in flat1:
        node = p2
        for k in path:
            node = node[k.key]
        np.testing.assert_array_equal(np.asarray(leaf), node,
                                      err_msg=jax.tree_util.keystr(path))
    for k in tokens:
        np.testing.assert_array_equal(np.asarray(tokens[k]), tokens2[k])


def test_import_accepts_dataparallel_prefix(model_and_params):
    model, params, tokens = model_and_params
    sd = params_to_feam_state_dict(params, tokens)
    sd_mod = {f"module.{k}": v for k, v in sd.items()}
    params2, _ = feam_state_dict_to_params(sd_mod)
    np.testing.assert_array_equal(
        np.asarray(params["params"]["encoder"]["conv1"]["kernel"]),
        params2["params"]["encoder"]["conv1"]["kernel"],
    )
