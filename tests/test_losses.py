"""Loss parity tests vs golden torch transcriptions of the reference."""
import jax.numpy as jnp
import numpy as np
import pytest

from pyvisim_tpu.losses import (
    FocalLoss,
    HybridFocalDiceLoss,
    MultiClassDiceLoss,
    contrastive_loss,
    nt_xent_loss,
    triplet_loss,
)


def torch_dice_golden(y_pred, y_true, log_loss=False, from_logits=True):
    """Transcription of reference MultiClassDiceLoss.forward
    (_losses.py:41-88) in torch."""
    import torch
    import torch.nn.functional as F

    y_pred = torch.from_numpy(y_pred)
    y_true = torch.from_numpy(y_true)
    if from_logits:
        y_pred = F.softmax(y_pred, dim=1)
    bs, num_classes = y_true.size(0), y_pred.size(1)
    dims = (0, 2)
    y_true = y_true.view(bs, num_classes, -1)
    y_pred = y_pred.view(bs, num_classes, -1)
    inter = torch.sum(y_pred * y_true, dim=dims)
    card = torch.sum(y_pred + y_true, dim=dims)
    scores = (2 * inter) / card.clamp_min(1e-7)
    loss = -torch.log(scores.clamp_min(1e-7)) if log_loss else 1.0 - scores
    mask = y_true.sum(dims) > 0
    loss = loss * mask.to(loss.dtype)
    return float(loss.mean())


@pytest.fixture
def seg_batch(rng):
    logits = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 4, size=(2, 8, 8))
    one_hot = np.eye(4, dtype=np.float32)[labels].transpose(0, 3, 1, 2)
    return logits, one_hot


def test_dice_matches_torch_golden(seg_batch):
    logits, target = seg_batch
    got = float(MultiClassDiceLoss(mode="multiclass")(logits, target))
    want = torch_dice_golden(logits, target)
    assert got == pytest.approx(want, abs=1e-5)


def test_dice_log_loss(seg_batch):
    logits, target = seg_batch
    got = float(MultiClassDiceLoss(mode="multiclass", log_loss=True)(logits, target))
    want = torch_dice_golden(logits, target, log_loss=True)
    assert got == pytest.approx(want, abs=1e-5)


def test_dice_absent_class_masked(rng):
    logits = rng.normal(size=(1, 3, 4, 4)).astype(np.float32)
    # class 2 never appears in the target
    labels = rng.integers(0, 2, size=(1, 4, 4))
    target = np.eye(3, dtype=np.float32)[labels].transpose(0, 3, 1, 2)
    got = float(MultiClassDiceLoss(mode="multiclass")(logits, target))
    want = torch_dice_golden(logits, target)
    assert got == pytest.approx(want, abs=1e-5)


def torch_focal_golden(y_pred, y_true, gamma=2.0, alpha=None):
    """Transcription of reference FocalLoss.forward multiclass path
    (_losses.py:113-171)."""
    import torch
    import torch.nn.functional as F

    y_pred = torch.from_numpy(y_pred)
    y_true_t = torch.from_numpy(y_true)
    labels = torch.argmax(y_true_t, dim=1)
    probs = F.softmax(y_pred, dim=1)
    nc = probs.size(1)
    probs = probs.permute(0, 2, 3, 1).reshape(-1, nc)
    labels = labels.view(-1)
    p_t = probs[torch.arange(probs.size(0)), labels]
    if alpha is None:
        alpha = torch.ones(nc) / nc
    else:
        alpha = torch.as_tensor(alpha, dtype=probs.dtype)
        alpha = alpha / alpha.sum()
    alpha_t = alpha[labels]
    w = alpha_t * (1 - p_t) ** gamma
    return float((w * (-torch.log(p_t.clamp(min=1e-7)))).mean())


def test_focal_matches_torch_golden(seg_batch):
    logits, target = seg_batch
    got = float(FocalLoss(mode="multiclass")(logits, target))
    want = torch_focal_golden(logits, target)
    assert got == pytest.approx(want, rel=1e-5)


def test_focal_with_alpha(seg_batch):
    logits, target = seg_batch
    alpha = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    got = float(FocalLoss(mode="multiclass", alpha=alpha)(logits, target))
    want = torch_focal_golden(logits, target, alpha=alpha)
    assert got == pytest.approx(want, rel=1e-5)


def test_hybrid_weights_validation(seg_batch):
    with pytest.raises(ValueError, match="must be equal to 1.0"):
        HybridFocalDiceLoss(mode="multiclass")  # default 1.0 + 1.0
    logits, target = seg_batch
    h = HybridFocalDiceLoss(mode="multiclass", dice_weight=0.3, focal_weight=0.7)
    d = float(MultiClassDiceLoss(mode="multiclass")(logits, target))
    f = float(FocalLoss(mode="multiclass")(logits, target))
    assert float(h(logits, target)) == pytest.approx(0.3 * d + 0.7 * f, rel=1e-5)


def test_triplet_loss_ordering(rng):
    a = rng.normal(size=(4, 16)).astype(np.float32)
    pos = a + 0.01 * rng.normal(size=(4, 16)).astype(np.float32)
    neg = rng.normal(size=(4, 16)).astype(np.float32)
    good = float(triplet_loss(a, pos, neg))
    bad = float(triplet_loss(a, neg, pos))
    assert good < bad
    assert good < 0.3


def test_contrastive_loss(rng):
    e1 = rng.normal(size=(6, 8)).astype(np.float32)
    same = np.array([1, 1, 1, 0, 0, 0])
    close = e1 + 0.01
    l_same = float(contrastive_loss(e1, close, np.ones(6)))
    assert l_same < 1e-3
    far = -e1
    l_far = float(contrastive_loss(e1, far, np.zeros(6), margin=1.0))
    assert l_far < 1.0  # pushed beyond margin mostly


def test_nt_xent_prefers_clustered(rng):
    labels = np.array([0, 0, 1, 1])
    clustered = np.array(
        [[1, 0], [0.9, 0.1], [-1, 0], [-0.9, -0.1]], np.float32
    )
    rand = rng.normal(size=(4, 2)).astype(np.float32)
    assert float(nt_xent_loss(clustered, labels)) < float(nt_xent_loss(rand, labels))


@pytest.mark.parametrize("kind", ["arcface", "cosface"])
def test_margin_softmax_loss(kind, rng):
    from pyvisim_tpu.losses import margin_softmax_loss

    c, e = 5, 16
    w = rng.normal(size=(c, e)).astype(np.float32)
    labels = np.array([0, 1, 2, 3, 4, 0])
    # embeddings aligned with their class weights -> low loss
    aligned = w[labels] + 0.01 * rng.normal(size=(6, e)).astype(np.float32)
    lo = float(margin_softmax_loss(aligned, labels, w, kind=kind))
    scrambled = w[(labels + 2) % c]
    hi = float(margin_softmax_loss(scrambled, labels, w, kind=kind))
    assert lo < hi
    assert np.isfinite(lo) and np.isfinite(hi)
    # gradients flow to both embeddings and weights
    import jax

    g_e, g_w = jax.grad(
        lambda z, ww: margin_softmax_loss(z, labels, ww, kind=kind), argnums=(0, 1)
    )(jnp.asarray(aligned), jnp.asarray(w))
    assert np.isfinite(np.asarray(g_e)).all()
    assert np.isfinite(np.asarray(g_w)).all()


def test_hybrid_ignore_index_only_masks_focal(seg_batch):
    """ADVICE r1: the reference's hybrid builds its dice term WITHOUT
    ignore_index (only focal masks; reference _losses.py:189-192)."""
    from pyvisim_tpu.losses import dice_loss, focal_loss, hybrid_focal_dice_loss

    logits, target = seg_batch
    h = hybrid_focal_dice_loss(logits, target, ignore_index=0)
    f = focal_loss(logits, target, ignore_index=0)
    d = dice_loss(logits, target)  # no ignore_index, per reference
    np.testing.assert_allclose(float(h), 0.5 * float(f) + 0.5 * float(d), rtol=1e-6)
