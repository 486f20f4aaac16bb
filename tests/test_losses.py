"""Loss parity tests vs the LIVE reference losses module.

Goldens here are computed by running the actual reference implementation
(``pyvisim.losses._losses``, loaded by ``_reference_oracle``) on the same
inputs — not hand transcriptions (VERDICT r4 task 1c retired those). The
broader live-loss parameter sweeps live in test_reference_oracle.py; these
tests keep the loss module's own suite self-contained.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import _reference_oracle
from pyvisim_tpu.losses import (
    FocalLoss,
    HybridFocalDiceLoss,
    MultiClassDiceLoss,
    contrastive_loss,
    nt_xent_loss,
    triplet_loss,
)


def _ref_losses():
    if not _reference_oracle.reference_available():  # pragma: no cover
        pytest.skip("reference package not mounted")
    _reference_oracle.load_reference()
    import pyvisim.losses._losses as mod

    return mod


def torch_dice_golden(y_pred, y_true, log_loss=False, from_logits=True):
    """Run the reference MultiClassDiceLoss (_losses.py:41-88) live."""
    import torch

    loss = _ref_losses().MultiClassDiceLoss(
        mode="multiclass", log_loss=log_loss, from_logits=from_logits
    )
    return float(loss(torch.from_numpy(y_pred), torch.from_numpy(y_true)))


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
    """Run the reference FocalLoss multiclass path (_losses.py:113-171)
    live."""
    import torch

    if alpha is not None:
        alpha = torch.as_tensor(np.asarray(alpha), dtype=torch.float32)
    loss = _ref_losses().FocalLoss(mode="multiclass", gamma=gamma, alpha=alpha)
    return float(loss(torch.from_numpy(y_pred), torch.from_numpy(y_true)))


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
