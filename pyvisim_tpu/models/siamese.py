"""Siamese embedding network + trainer.

The reference's ``pyvisim/neural_networks`` package is a README-only stub
("TODO: Implement Siamese Network", reference:
pyvisim/neural_networks/README.md:1-3; README.md:82-84 lists it as Coming
Soon). This module delivers that capability TPU-natively: a Flax embedding
network (VGG conv trunk -> GeM pooling -> projection head) trained with the
retrieval losses in pyvisim_tpu.losses (triplet / contrastive / NT-Xent)
via optax, with a pure jittable ``train_step`` that pjit-shards over the
device mesh (see pyvisim_tpu/parallel/).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from ..losses import margin_softmax_loss, nt_xent_loss
from .vgg import VGG_CFGS

__all__ = ["SiameseEmbedder", "TrainState", "create_train_state", "train_step", "embed"]


class GeMPool(nn.Module):
    """Generalized-mean pooling over spatial dims (learnable exponent) —
    the standard retrieval pooling; p=1 -> mean, p->inf -> max."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, H, W, C)
        p = self.param("p", lambda k: jnp.asarray(3.0))
        x = jnp.maximum(x, self.eps) ** p
        return jnp.mean(x, axis=(1, 2)) ** (1.0 / p)


class SiameseEmbedder(nn.Module):
    """Conv trunk + GeM pooling + 2-layer projection head -> L2-normalized
    embedding.

    :param cfg_name: VGG config for the trunk ("vgg11" keeps the dryrun
        cheap; "vgg16" for production).
    :param embed_dim: output embedding dimensionality.
    :param trunk_convs: number of leading conv blocks of the cfg to use
        (None = all). Fewer blocks = cheaper trunk for small inputs.
    :param n_classes: when set, a learnable (n_classes, embed_dim)
        class-weight matrix is created for margin-softmax training
        (losses 'arcface' / 'cosface').
    """

    cfg_name: str = "vgg16"
    embed_dim: int = 128
    trunk_convs: int | None = None
    n_classes: int | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, H, W, 3) in [0,1]
        cfg = VGG_CFGS[self.cfg_name]
        conv_i = 0
        for item in cfg:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            if self.trunk_convs is not None and conv_i >= self.trunk_convs:
                break
            x = nn.relu(
                nn.Conv(item, (3, 3), padding=1, dtype=self.dtype, name=f"conv{conv_i}")(x)
            )
            conv_i += 1
        x = GeMPool()(x)  # (B, C)
        x = nn.relu(nn.Dense(2 * self.embed_dim, dtype=self.dtype)(x))
        x = nn.Dense(self.embed_dim, dtype=self.dtype)(x)
        if self.n_classes is not None:
            # registered for margin-softmax losses; read from the param tree
            self.param(
                "class_weights",
                nn.initializers.normal(0.01),
                (self.n_classes, self.embed_dim),
            )
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(
    model: SiameseEmbedder,
    optimizer: optax.GradientTransformation,
    image_size: int = 64,
    seed: int = 0,
) -> TrainState:
    params = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, image_size, image_size, 3))
    )
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_loss_fn(model: SiameseEmbedder, loss: str = "nt_xent", **loss_kwargs) -> Callable:
    """Batch loss: images (B, H, W, 3) in [0,1] + integer labels (B,)."""

    def loss_fn(params, images, labels):
        emb = model.apply(params, images)
        if loss == "nt_xent":
            return nt_xent_loss(emb, labels, **loss_kwargs)
        if loss in ("arcface", "cosface"):
            w = params["params"]["class_weights"]
            return margin_softmax_loss(emb, labels, w, kind=loss, **loss_kwargs)
        if loss == "triplet":
            # batch-hard triplets mined inside the batch
            d = jnp.sum((emb[:, None, :] - emb[None, :, :]) ** 2, axis=-1)
            same = labels[:, None] == labels[None, :]
            eye = jnp.eye(labels.shape[0], dtype=bool)
            hardest_pos = jnp.max(jnp.where(same & ~eye, d, 0.0), axis=1)
            hardest_neg = jnp.min(jnp.where(~same, d, jnp.inf), axis=1)
            margin = loss_kwargs.get("margin", 0.2)
            return jnp.mean(jnp.maximum(hardest_pos - hardest_neg + margin, 0.0))
        raise ValueError(f"Unknown loss: {loss}")

    return loss_fn


def train_step(
    model: SiameseEmbedder,
    optimizer: optax.GradientTransformation,
    loss: str = "nt_xent",
    **loss_kwargs,
) -> Callable[[TrainState, jnp.ndarray, jnp.ndarray], tuple[TrainState, jnp.ndarray]]:
    """Build the pure training-step function
    ``(state, images, labels) -> (state, loss)`` — jit/pjit it at the call
    site with the desired shardings (see parallel/train.py)."""
    loss_fn = make_loss_fn(model, loss, **loss_kwargs)

    def step(state: TrainState, images, labels):
        lval, grads = jax.value_and_grad(loss_fn)(state.params, images, labels)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), lval

    return step


def embed(model: SiameseEmbedder, params, images: jnp.ndarray) -> jnp.ndarray:
    """Jitted embedding forward for retrieval indexing."""
    return jax.jit(model.apply)(params, images)
