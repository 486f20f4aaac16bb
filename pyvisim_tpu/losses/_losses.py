"""Losses: segmentation (Dice / Focal / Hybrid) and retrieval
(triplet / contrastive / NT-Xent).

Capability parity with reference pyvisim/losses/_losses.py:17-202 (torch),
re-implemented as pure JAX functions with thin class wrappers mirroring the
reference's constructor surface. The retrieval losses are the reference's
own declared future work (_losses.py:1-4) and feed the Siamese trainer
(models/siamese.py).

All functions accept jnp or numpy arrays and are jit/grad-compatible.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "soft_dice_score",
    "dice_loss",
    "focal_loss",
    "hybrid_focal_dice_loss",
    "triplet_loss",
    "contrastive_loss",
    "nt_xent_loss",
    "margin_softmax_loss",
    "MultiClassDiceLoss",
    "FocalLoss",
    "HybridFocalDiceLoss",
]


def soft_dice_score(output, target, smooth: float = 0.0, eps: float = 1e-7, dims=None):
    """Soft dice score (parity: pyvisim/_utils.py:285-309)."""
    output = jnp.asarray(output)
    target = jnp.asarray(target)
    if dims is not None:
        intersection = jnp.sum(output * target, axis=dims)
        cardinality = jnp.sum(output + target, axis=dims)
    else:
        intersection = jnp.sum(output * target)
        cardinality = jnp.sum(output + target)
    return (2.0 * intersection + smooth) / jnp.maximum(cardinality + smooth, eps)


def dice_loss(
    y_pred,
    y_true,
    *,
    mode: str = "multiclass",
    classes=None,
    log_loss: bool = False,
    from_logits: bool = True,
    smooth: float = 0.0,
    eps: float = 1e-7,
    ignore_index: Optional[int] = None,
):
    """Multi-class soft-dice loss on (B, C, H, W) tensors.

    Parity with reference MultiClassDiceLoss.forward (_losses.py:41-88),
    including the absent-class masking (_losses.py:80-81: classes not
    present in the mask contribute zero loss rather than 1).
    """
    y_pred = jnp.asarray(y_pred)
    y_true = jnp.asarray(y_true)
    assert y_pred.ndim == y_true.ndim == 4, (
        f"Expected 4D input tensors, got {y_pred.ndim} for y_pred and "
        f"{y_true.ndim} for y_true"
    )
    if from_logits:
        y_pred = (
            jax.nn.softmax(y_pred, axis=1)
            if mode == "multiclass"
            else jax.nn.sigmoid(y_pred)
        )
    b, c = y_true.shape[0], y_pred.shape[1]
    dims = (0, 2)
    y_true = y_true.reshape(b, c, -1)
    y_pred = y_pred.reshape(b, c, -1)
    if ignore_index is not None:
        y_pred = y_pred * (y_true != ignore_index)
    scores = soft_dice_score(
        y_pred, y_true.astype(y_pred.dtype), smooth=smooth, eps=eps, dims=dims
    )
    loss = -jnp.log(jnp.maximum(scores, eps)) if log_loss else 1.0 - scores
    present = jnp.sum(y_true, axis=dims) > 0  # zero loss for absent classes
    loss = loss * present.astype(loss.dtype)
    if classes is not None:
        loss = loss[jnp.asarray(classes)]
    return jnp.mean(loss)


def focal_loss(
    y_pred,
    y_true,
    *,
    mode: str = "multiclass",
    alpha=None,
    normalize_weights: bool = True,
    gamma: float = 2.0,
    from_logits: bool = True,
    ignore_index: Optional[int] = None,
):
    """Focal loss on (B, C, H, W) tensors (one-hot targets).

    Parity with reference FocalLoss.forward (_losses.py:113-171). The
    reference's boolean-mask row filtering (data-dependent shapes) becomes
    weight masking so the whole loss jits.
    """
    y_pred = jnp.asarray(y_pred)
    y_true = jnp.asarray(y_true)
    assert y_pred.ndim == y_true.ndim == 4
    labels = jnp.argmax(y_true, axis=1)  # (B, H, W)
    if from_logits:
        y_pred = (
            jax.nn.softmax(y_pred, axis=1)
            if mode == "multiclass"
            else jax.nn.sigmoid(y_pred)
        )
    if mode == "multiclass":
        num_classes = y_pred.shape[1]
        probs = jnp.moveaxis(y_pred, 1, -1).reshape(-1, num_classes)  # (N, C)
        labels_flat = labels.reshape(-1)
        p_t = probs[jnp.arange(probs.shape[0]), labels_flat]
        if alpha is None:
            alpha = jnp.ones(num_classes) / num_classes
        else:
            alpha = jnp.asarray(alpha)
            if normalize_weights:
                alpha = alpha / jnp.sum(alpha)
        alpha_t = alpha[labels_flat]
        valid = (
            (labels_flat != ignore_index) if ignore_index is not None else None
        )
    else:
        probs = y_pred.reshape(-1)
        labels_flat = labels.reshape(-1).astype(probs.dtype)
        p_t = probs * labels_flat + (1 - probs) * (1 - labels_flat)
        alpha_t = (
            alpha * labels_flat + (1 - alpha) * (1 - labels_flat)
            if alpha is not None
            else 1.0
        )
        valid = (
            (labels_flat != ignore_index) if ignore_index is not None else None
        )
    focal_weight = alpha_t * (1 - p_t) ** gamma
    loss = focal_weight * (-jnp.log(jnp.maximum(p_t, 1e-7)))
    if valid is not None:
        loss = loss * valid
        return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1)
    return jnp.mean(loss)


def hybrid_focal_dice_loss(
    y_pred,
    y_true,
    *,
    mode: str = "multiclass",
    alpha=None,
    gamma: float = 2.0,
    from_logits: bool = True,
    ignore_index: Optional[int] = None,
    dice_weight: float = 0.5,
    focal_weight: float = 0.5,
    smooth: float = 1e-5,
    eps: float = 1e-7,
):
    """Convex blend of focal and dice losses; weights must sum to 1
    (parity: _losses.py:174-202)."""
    if not dice_weight + focal_weight == 1.0:
        raise ValueError(
            "Sum of dice_weight and focal_weight must be equal to 1.0, got "
            f"{dice_weight} + {focal_weight} = {dice_weight + focal_weight}"
        )
    f = focal_loss(
        y_pred, y_true, mode=mode, alpha=alpha, gamma=gamma,
        from_logits=from_logits, ignore_index=ignore_index,
    )
    # Parity: the reference's HybridFocalDiceLoss builds its dice term
    # WITHOUT ignore_index (only the focal term masks; _losses.py:189-192).
    d = dice_loss(
        y_pred, y_true, mode=mode, from_logits=from_logits,
        smooth=smooth, eps=eps,
    )
    return focal_weight * f + dice_weight * d


# ---------------------------------------------------------------------------
# Retrieval losses (the reference's declared future work, _losses.py:1-4)
# ---------------------------------------------------------------------------
def triplet_loss(anchor, positive, negative, margin: float = 0.2):
    """Triplet margin loss on L2-normalized embeddings (B, D)."""
    a = _l2n(anchor)
    p = _l2n(positive)
    n = _l2n(negative)
    d_ap = jnp.sum((a - p) ** 2, axis=-1)
    d_an = jnp.sum((a - n) ** 2, axis=-1)
    return jnp.mean(jnp.maximum(d_ap - d_an + margin, 0.0))


def contrastive_loss(emb1, emb2, same_label, margin: float = 1.0):
    """Contrastive (pair) loss: pull same-label pairs, push others to
    ``margin``. ``same_label``: (B,) {0,1}."""
    d = jnp.sqrt(jnp.sum((_l2n(emb1) - _l2n(emb2)) ** 2, axis=-1) + 1e-12)
    same = jnp.asarray(same_label, d.dtype)
    return jnp.mean(same * d**2 + (1 - same) * jnp.maximum(margin - d, 0.0) ** 2)


def nt_xent_loss(embeddings, labels, temperature: float = 0.1):
    """Supervised NT-Xent (InfoNCE over same-label positives) on (B, D)."""
    z = _l2n(embeddings)
    sim = jnp.dot(z, z.T) / temperature
    b = z.shape[0]
    eye = jnp.eye(b, dtype=bool)
    sim = jnp.where(eye, -jnp.inf, sim)
    labels = jnp.asarray(labels)
    pos = (labels[:, None] == labels[None, :]) & ~eye
    log_prob = sim - jax.scipy.special.logsumexp(sim, axis=1, keepdims=True)
    pos_count = jnp.maximum(jnp.sum(pos, axis=1), 1)
    loss = -jnp.sum(jnp.where(pos, log_prob, 0.0), axis=1) / pos_count
    has_pos = jnp.sum(pos, axis=1) > 0
    return jnp.sum(loss * has_pos) / jnp.maximum(jnp.sum(has_pos), 1)


def _l2n(x):
    x = jnp.asarray(x)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# Class wrappers mirroring the reference's torch-module API
# ---------------------------------------------------------------------------
class _LossModule:
    def __call__(self, y_pred, y_true):
        return self.forward(y_pred, y_true)


class MultiClassDiceLoss(_LossModule):
    """Class wrapper over :func:`dice_loss`
    (constructor parity: _losses.py:18-39)."""

    __name__ = "MultiClassDiceLoss"

    def __init__(
        self,
        mode: str,
        classes=None,
        log_loss: bool = False,
        from_logits: bool = True,
        smooth: float = 0.0,
        eps: float = 1e-7,
        ignore_index: Optional[int] = None,
    ) -> None:
        assert mode in {"binary", "multiclass"}, (
            f"Unknown mode: {mode}. Supported modes are 'multiclass' and 'binary'."
        )
        self.kwargs = dict(
            mode=mode, classes=classes, log_loss=log_loss, from_logits=from_logits,
            smooth=smooth, eps=eps, ignore_index=ignore_index,
        )

    def forward(self, y_pred, y_true):
        return dice_loss(y_pred, y_true, **self.kwargs)


class FocalLoss(_LossModule):
    """Class wrapper over :func:`focal_loss`
    (constructor parity: _losses.py:91-111)."""

    __name__ = "FocalLoss"

    def __init__(
        self,
        mode: str,
        alpha=None,
        normalize_weights: bool = True,
        gamma: float = 2.0,
        from_logits: bool = True,
        ignore_index: Optional[int] = None,
    ) -> None:
        assert mode in {"binary", "multiclass"}, (
            f"Unknown mode: {mode}. Supported modes are 'multiclass' and 'binary'."
        )
        self.kwargs = dict(
            mode=mode, alpha=alpha, normalize_weights=normalize_weights,
            gamma=gamma, from_logits=from_logits, ignore_index=ignore_index,
        )

    def forward(self, y_pred, y_true):
        return focal_loss(y_pred, y_true, **self.kwargs)


class HybridFocalDiceLoss(_LossModule):
    """Class wrapper over :func:`hybrid_focal_dice_loss`
    (constructor parity: _losses.py:174-196)."""

    def __init__(
        self,
        mode: str,
        alpha=None,
        gamma: float = 2.0,
        from_logits: bool = True,
        ignore_index: Optional[int] = None,
        dice_weight: float = 1.0,
        focal_weight: float = 1.0,
        smooth: float = 1e-5,
        eps: float = 1e-7,
    ) -> None:
        if not dice_weight + focal_weight == 1.0:
            raise ValueError(
                "Sum of dice_weight and focal_weight must be equal to 1.0, got "
                f"{dice_weight} + {focal_weight} = {dice_weight + focal_weight}"
            )
        self.kwargs = dict(
            mode=mode, alpha=alpha, gamma=gamma, from_logits=from_logits,
            ignore_index=ignore_index, dice_weight=dice_weight,
            focal_weight=focal_weight, smooth=smooth, eps=eps,
        )

    def forward(self, y_pred, y_true):
        return hybrid_focal_dice_loss(y_pred, y_true, **self.kwargs)


def margin_softmax_loss(
    embeddings,
    labels,
    class_weights,
    *,
    margin: float = 0.5,
    scale: float = 64.0,
    kind: str = "arcface",
):
    """Large-margin softmax over L2-normalized embeddings and class weights.

    ``kind='arcface'`` adds an additive *angular* margin (cos(theta + m));
    ``kind='cosface'`` an additive *cosine* margin (cos(theta) - m). The
    standard heads for face/instance retrieval training — a natural
    extension of the reference's declared retrieval-loss roadmap
    (_losses.py:1-4).

    :param embeddings: (B, E)
    :param labels: (B,) int class ids
    :param class_weights: (C, E) learnable class centers
    """
    z = _l2n(embeddings)
    w = _l2n(class_weights)
    cos = jnp.clip(jnp.dot(z, w.T), -1.0 + 1e-7, 1.0 - 1e-7)  # (B, C)
    labels = jnp.asarray(labels)
    one_hot = jax.nn.one_hot(labels, class_weights.shape[0])
    if kind == "arcface":
        theta = jnp.arccos(cos)
        cos_margin = jnp.cos(theta + margin)
    elif kind == "cosface":
        cos_margin = cos - margin
    else:
        raise ValueError(f"Unknown margin-softmax kind: {kind!r}")
    logits = scale * (one_hot * cos_margin + (1.0 - one_hot) * cos)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(one_hot * log_probs, axis=-1))
