"""Parity tests for the loss library vs torch implementations of the
reference formulas (loss_functions/loss_partial.py, losses.py).

The torch reimplementations below follow the reference math exactly (boolean
indexing, smooth terms, reductions) so any divergence in the jax weighted-sum
rewrites shows up here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from multimodal_pl_tpu.losses import (
    bce_loss,
    edice_full,
    edice_full2,
    edice_partial,
    refine_loss,
    segmentation_loss,
    smooth_cross_entropy,
    feature_ramp,
)
from multimodal_pl_tpu.losses.legacy import (
    bce_no_bg5,
    binary_dice,
    dice_softmax_fg,
    tal5_loss,
    tal6_loss,
    tal_loss,
    tal_loss_weighted,
    tal_update_weights,
)

# ---------------------------------------------------------------------------
# torch reference formulas (mirroring loss_partial.py / losses.py semantics)
# ---------------------------------------------------------------------------


def t_dice_core(score, target, mask):
    # loss_partial.py:24-36 (boolean indexing + smooth placement)
    score = score[mask.bool()]
    tm = mask if mask.shape == target.shape else mask.squeeze(1)  # loss_partial.py:28
    target = target.float()[tm.bool()]
    smooth = 1e-5
    intersect = torch.sum(score * target)
    y_sum = torch.sum(target * target)
    z_sum = torch.sum(score * score)
    return 1 - (2 * intersect + smooth) / (z_sum + y_sum + smooth)


def t_multiclass_dice(probs, labels, n_classes, weight=None):
    # loss_partial.py:38-57, mask=None branch
    loss = 0.0
    for i in range(n_classes):
        tgt = (labels == i).float()
        d = t_dice_core(probs[:, i], tgt, torch.ones_like(tgt))
        w = 1.0 if weight is None else float(weight[i])
        loss = loss + d * w
    return loss / n_classes


def t_edice_partial(logits, labels, sup_mask, uce=True):
    probs = torch.softmax(logits, dim=1)
    loss = t_multiclass_dice(probs, labels, logits.shape[1], sup_mask)
    if uce:
        for l in range(logits.shape[1]):
            loss = loss + F.binary_cross_entropy(
                probs[:, l].float(), (labels == l).float()
            ) * float(sup_mask[l])
    return loss


def t_edice_full(logits, labels, uce=True):
    probs = torch.softmax(logits, dim=1)
    loss = t_multiclass_dice(probs, labels, logits.shape[1])
    if uce:
        loss = loss + F.cross_entropy(logits.float(), labels.long())
    return loss


def t_edice_full2(inputs, target, mask=None, uce=True, sigmoid=True):
    scores = torch.sigmoid(inputs) if sigmoid else inputs
    if mask is None:
        mask = torch.ones_like(target).unsqueeze(0)
    loss = t_dice_core(scores, target, mask)
    if uce:
        loss = loss + F.binary_cross_entropy_with_logits(
            inputs.float().squeeze(0), target.float()
        )
    return loss


def to_t(x_chlast):
    """(B, D, H, W, C) -> torch (B, C, D, H, W)"""
    return torch.from_numpy(np.asarray(x_chlast).transpose(0, 4, 1, 2, 3))


# ---------------------------------------------------------------------------


class TestEDice:
    def test_edice_partial(self, rng):
        nc = 5
        logits = rng.standard_normal((2, 4, 6, 6, nc)).astype(np.float32)
        labels = rng.integers(0, nc, (2, 4, 6, 6))
        sup = np.array([1, 0, 1, 1, 0], np.float32)
        got = float(edice_partial(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(sup)))
        want = float(t_edice_partial(to_t(logits), torch.from_numpy(labels), sup))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_edice_partial_no_uce(self, rng):
        nc = 4
        logits = rng.standard_normal((1, 4, 4, 4, nc)).astype(np.float32)
        labels = rng.integers(0, nc, (1, 4, 4, 4))
        sup = np.ones(nc, np.float32)
        got = float(
            edice_partial(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(sup), uce=False)
        )
        want = float(t_edice_partial(to_t(logits), torch.from_numpy(labels), sup, uce=False))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_edice_full(self, rng):
        logits = rng.standard_normal((1, 4, 4, 4, 2)).astype(np.float32)
        labels = rng.integers(0, 2, (1, 4, 4, 4))
        got = float(edice_full(jnp.asarray(logits), jnp.asarray(labels)))
        want = float(t_edice_full(to_t(logits), torch.from_numpy(labels)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_edice_full2_masked(self, rng):
        x = rng.standard_normal((1, 1, 4, 4, 4)).astype(np.float32)  # (1,1,D,H,W) torch-style
        tgt = (rng.random((1, 4, 4, 4)) > 0.5).astype(np.float32)
        mask = (rng.random((1, 1, 4, 4, 4)) > 0.3).astype(np.float32)
        # jax: same layout semantics via explicit broadcast
        got = float(
            edice_full2(jnp.asarray(x[:, 0]), jnp.asarray(tgt), jnp.asarray(mask[:, 0]), uce=False)
        )
        want = float(
            t_edice_full2(torch.from_numpy(x[:, 0]), torch.from_numpy(tgt),
                          torch.from_numpy(mask[:, 0]), uce=False)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_edice_full2_bce(self, rng):
        x = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
        tgt = (rng.random((1, 4, 4, 4)) > 0.5).astype(np.float32)
        got = float(edice_full2(jnp.asarray(x), jnp.asarray(tgt)))
        # reference call shape: inputs (1, 1, D, H, W), target (1, D, H, W)
        want = float(t_edice_full2(torch.from_numpy(x).unsqueeze(1), torch.from_numpy(tgt)))
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestCompose:
    def _torch_get_loss(self, logits, labels, sup, deeps, attns, rlogits, label_t, wf):
        """Reference get_loss (losses.py:107-182), torch, B=1, deep_up layout."""
        nc = logits.shape[1]
        num_fg = nc - 1
        total = t_edice_partial(logits, labels, sup)
        weights = [0.125, 0.25, 0.5, 1]
        for idx, d in enumerate(deeps):
            ct = F.interpolate(labels.unsqueeze(1).float(), d.shape[2:], mode="nearest").squeeze(1)
            total = total + t_edice_partial(d, ct.long(), sup, uce=False) * weights[idx]
        if rlogits is None:
            return total
        rp = torch.softmax(rlogits, 1)  # (13, 2, D, H, W)
        confi = ((rp > 0.9) | (rp < 0.1)).float()
        supcount = int(label_t.sum())
        maps = list(attns) + [torch.softmax(logits, 1)[:, 1:]]
        aux = 0.0
        for idx, l in enumerate(maps):
            for g in range(num_fg):
                if label_t[g]:
                    continue
                if idx == 3:
                    cd = t_edice_full2(l[:, g : g + 1], rp[g : g + 1, 1], confi[g : g + 1, 1:],
                                       uce=False, sigmoid=False)
                else:
                    cd = t_edice_full2(l[:, g : g + 1], rp[g : g + 1, 1], confi[g : g + 1, 1:],
                                       uce=False)
                aux = aux + cd / (num_fg - supcount) * weights[idx] * wf
        return total + aux

    def test_segmentation_loss_pretrain(self, rng):
        nc, D = 5, 8
        logits = rng.standard_normal((1, D, D, D, nc)).astype(np.float32)
        labels = rng.integers(0, nc, (1, D, D, D))
        sup = np.array([1, 1, 0, 1, 0], np.float32)
        deeps = [
            rng.standard_normal((1, D // 8, D // 8, D // 8, nc)).astype(np.float32),
            rng.standard_normal((1, D // 4, D // 4, D // 4, nc)).astype(np.float32),
            rng.standard_normal((1, D // 2, D // 2, D // 2, nc)).astype(np.float32),
        ]
        got = float(
            segmentation_loss(
                jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(sup),
                [jnp.asarray(d) for d in deeps], attns=[],
            )
        )
        want = float(
            self._torch_get_loss(to_t(logits), torch.from_numpy(labels), sup,
                                 [to_t(d) for d in deeps], [], None, None, 0.0)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_segmentation_loss_full(self, rng):
        nc, D = 4, 8
        num_fg = nc - 1
        logits = rng.standard_normal((1, D, D, D, nc)).astype(np.float32)
        labels = rng.integers(0, nc, (1, D, D, D))
        sup = np.array([1, 1, 0, 1], np.float32)
        deeps = [
            rng.standard_normal((1, D // 8, D // 8, D // 8, nc)).astype(np.float32),
            rng.standard_normal((1, D // 4, D // 4, D // 4, nc)).astype(np.float32),
            rng.standard_normal((1, D // 2, D // 2, D // 2, nc)).astype(np.float32),
        ]
        # deep_up layout: attns full-size
        attns = [rng.standard_normal((1, D, D, D, num_fg)).astype(np.float32) for _ in range(3)]
        rlog = rng.standard_normal((num_fg, D, D, D, 2)).astype(np.float32)
        label_t = np.array([1, 0, 0], np.float32)
        wf = 0.07
        got = float(
            segmentation_loss(
                jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(sup),
                [jnp.asarray(d) for d in deeps], [jnp.asarray(a) for a in attns],
                jnp.asarray(rlog), jnp.asarray(label_t), wf,
            )
        )
        want = float(
            self._torch_get_loss(
                to_t(logits), torch.from_numpy(labels), sup, [to_t(d) for d in deeps],
                [to_t(a) for a in attns],
                torch.from_numpy(rlog.transpose(0, 4, 1, 2, 3)),
                torch.from_numpy(label_t), wf,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_refine_loss(self, rng):
        num_fg, D = 3, 8
        rlog = rng.standard_normal((num_fg, D, D, D, 2)).astype(np.float32)
        labels = rng.integers(0, num_fg + 1, (1, D, D, D))
        weights = np.array([0, 1, 1], np.float32)  # tlist = {1, 2}
        got = float(refine_loss(jnp.asarray(rlog), jnp.asarray(labels), jnp.asarray(weights),
                                aug_mask=2))
        # reference loop (losses.py:46-62) over tlist organs, x augmask copies
        want = 0.0
        tr = torch.from_numpy(rlog.transpose(0, 4, 1, 2, 3))
        tl = torch.from_numpy(labels)
        for _ in range(2):  # augmask copies are identical
            for l in [1, 2]:
                want = want + t_edice_full(tr[l : l + 1], (tl == (l + 1)).long(), uce=False)
        np.testing.assert_allclose(got, float(want), rtol=1e-5)

    def test_feature_ramp(self):
        assert float(feature_ramp(10, pretrain_epoch=20)) == 0.0
        np.testing.assert_allclose(float(feature_ramp(25)), 0.1 / 50 * 25, rtol=1e-6)
        np.testing.assert_allclose(float(feature_ramp(400)), 0.1, rtol=1e-6)


class TestGAN:
    def test_smooth_ce_matches_torch(self, rng):
        logits = rng.standard_normal((6, 2)).astype(np.float32)
        targets = rng.integers(0, 2, (6,))
        got = float(smooth_cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
        want = float(F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(targets)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_bce_loss_constant_target(self, rng):
        logits = rng.standard_normal((4, 2)).astype(np.float32)
        got = float(bce_loss(jnp.asarray(logits), 1))
        want = float(
            F.cross_entropy(torch.from_numpy(logits), torch.ones(4, dtype=torch.long))
        )
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_smoothing(self, rng):
        logits = rng.standard_normal((4, 3)).astype(np.float32)
        targets = np.array([0, 1, 2, 0])
        got = float(smooth_cross_entropy(jnp.asarray(logits), jnp.asarray(targets), 0.1))
        # reference k_one_hot: off-classes get s/(n-1), target 1-s (losses.py:448-453)
        t = torch.full((4, 3), 0.1 / 2)
        t.scatter_(1, torch.from_numpy(targets).unsqueeze(1), 0.9)
        want = float((-t * F.log_softmax(torch.from_numpy(logits), -1)).sum(-1).mean())
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestLegacy:
    def test_binary_dice_ignore(self, rng):
        p = rng.random((3, 4, 4)).astype(np.float32)
        t = (rng.random((3, 4, 4)) > 0.5).astype(np.float32)
        t[1] = -1  # ignored sample
        got = float(binary_dice(jnp.asarray(p), jnp.asarray(t)))
        pt, tt = torch.from_numpy(p).reshape(3, -1), torch.from_numpy(t).reshape(3, -1)
        num = torch.sum(pt * tt, 1)
        den = torch.sum(pt, 1) + torch.sum(tt, 1) + 1
        dl = 1 - 2 * num / den
        want = float(dl[tt[:, 0] != -1].sum() / dl[tt[:, 0] != -1].shape[0])
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_dice_softmax_fg(self, rng):
        logits = rng.standard_normal((1, 4, 4, 4, 5)).astype(np.float32)
        labels = rng.integers(0, 5, (1, 4, 4, 4))
        got = float(dice_softmax_fg(jnp.asarray(logits), jnp.asarray(labels), 5))
        probs = torch.softmax(to_t(logits), 1)
        want = 0.0
        for i in range(1, 5):
            tgt = (torch.from_numpy(labels) == i).float()
            sc = probs[:, i]
            inter, y, z = (sc * tgt).sum(), (tgt * tgt).sum(), (sc * sc).sum()
            want = want + (1 - (2 * inter) / (z + y + 1e-5))
        np.testing.assert_allclose(got, float(want) / 4, rtol=1e-5)

    def test_tal_marginal_ce(self, rng):
        logits = rng.standard_normal((1, 4, 4, 4, 12)).astype(np.float32)
        labels = np.zeros((1, 4, 4, 4), np.int64)
        labels[0, :2] = 1
        labels[0, 2:] = 2
        got = float(tal_loss(jnp.asarray(logits), jnp.asarray(labels), [0]))
        # reference TAL (loss.py:348-370), task 0: bg ids merged, fg = 1, 2
        t = to_t(logits)
        bg = [0, 3, 4, 5, 6, 7, 8, 9, 10, 11]
        merged = torch.cat([t[0, bg].sum(0, keepdims=True), t[0, [1, 2]]], 0).unsqueeze(0)
        want = float(F.cross_entropy(merged, torch.from_numpy(labels)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    @staticmethod
    def _tal_binary_torch(logits, labels, tid, fg, nc):
        """Reference TAL5/TAL6 body (loss.py:388-406, :421-435)."""
        t = to_t(logits)
        bg = [c for c in range(nc) if c != fg]
        merged = torch.cat([t[0, bg].sum(0, keepdims=True), t[0, [fg]]], 0).unsqueeze(0)
        tgt = torch.where(torch.from_numpy(labels) > 0,
                          torch.tensor(1.0), torch.tensor(0.0)).long()
        return float(F.cross_entropy(merged, tgt))

    def test_tal6(self, rng):
        logits = rng.standard_normal((1, 4, 4, 4, 6)).astype(np.float32)
        labels = rng.integers(0, 6, (1, 4, 4, 4)).astype(np.int64)
        for tid, fg in [(0, 1), (2, 3), (6, 5)]:
            got = float(tal6_loss(jnp.asarray(logits), jnp.asarray(labels), [tid]))
            want = self._tal_binary_torch(logits, labels, tid, fg, 6)
            np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_tal5(self, rng):
        logits = rng.standard_normal((1, 4, 4, 4, 5)).astype(np.float32)
        labels = rng.integers(0, 5, (1, 4, 4, 4)).astype(np.int64)
        for tid, fg in [(0, 1), (1, 2), (3, 3), (6, 4)]:
            got = float(tal5_loss(jnp.asarray(logits), jnp.asarray(labels), [tid]))
            want = self._tal_binary_torch(logits, labels, tid, fg, 5)
            np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_tal_batch_sums(self, rng):
        """TAL5/TAL6 sum per-sample CE over the batch (loss.py:390, :423)."""
        logits = rng.standard_normal((2, 4, 4, 4, 5)).astype(np.float32)
        labels = rng.integers(0, 5, (2, 4, 4, 4)).astype(np.int64)
        got = float(tal5_loss(jnp.asarray(logits), jnp.asarray(labels), [0, 6]))
        want = (float(tal5_loss(jnp.asarray(logits[:1]), jnp.asarray(labels[:1]), [0]))
                + float(tal5_loss(jnp.asarray(logits[1:]), jnp.asarray(labels[1:]), [6])))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_bce_no_bg5(self, rng):
        logits = rng.standard_normal((2, 4, 4, 4, 5)).astype(np.float32)
        labels = rng.integers(0, 5, (2, 4, 4, 4)).astype(np.int64)
        task_ids = [0, 3]  # -> channels 1 and 3
        got = float(bce_no_bg5(jnp.asarray(logits), jnp.asarray(labels), task_ids))
        # reference loss.py:206-210
        t = to_t(logits)
        crit = torch.nn.BCEWithLogitsLoss(reduction="none")
        want = 0.0
        for i, tid in enumerate(task_ids):
            c = {0: 1, 1: 2, 3: 3, 6: 4}[tid]
            want += float(crit(t[i:i + 1, c, ...],
                               (torch.from_numpy(labels[i:i + 1]) == c).float()).mean())
        np.testing.assert_allclose(got, want / 2, rtol=1e-5)

    def test_tal_weighted_norm(self, rng):
        """TAL norm=True path: frequency weights + torch weighted-CE
        normalization (loss.py:337-368)."""
        logits = rng.standard_normal((1, 4, 4, 4, 12)).astype(np.float32)
        labels = np.zeros((1, 4, 4, 4), np.int64)
        labels[0, :1] = 1
        labels[0, 3:] = 2

        vs = jnp.zeros(12)
        vc = jnp.zeros(12)
        vs, vc, w = tal_update_weights(vs, vc, 500.0, 1, voxels=64 * 64)
        vs, vc, w = tal_update_weights(vs, vc, 900.0, 1, voxels=64 * 64)
        vs, vc, w = tal_update_weights(vs, vc, 200.0, 2, voxels=64 * 64)
        # torch running stats (per-class intent of loss.py:337-341)
        avg1 = ((500 + 900) / (64 * 64)) / 2
        avg2 = (200 / (64 * 64)) / 1
        w_ref = np.ones(12, np.float32)
        w_ref[1] = np.log(1 / avg1)
        w_ref[2] = np.log(1 / avg2)
        np.testing.assert_allclose(np.asarray(w), w_ref, rtol=1e-5)

        got = float(tal_loss_weighted(jnp.asarray(logits), jnp.asarray(labels),
                                      [0], jnp.asarray(w_ref), norm=True))
        t = to_t(logits)
        bg = [0, 3, 4, 5, 6, 7, 8, 9, 10, 11]
        merged = torch.cat([t[0, bg].sum(0, keepdims=True), t[0, [1, 2]]], 0).unsqueeze(0)
        wn = torch.from_numpy(w_ref) / torch.from_numpy(w_ref).mean()
        want = float(F.cross_entropy(merged, torch.from_numpy(labels),
                                     weight=wn[[0, 1, 2]]))
        np.testing.assert_allclose(got, want, rtol=1e-5)
