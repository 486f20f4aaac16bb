"""Sharded Siamese training step over a device mesh.

The full training step (embed -> retrieval loss -> optax update) is pjit'd
with:
  * images/labels sharded over the ``data`` axis (DP)
  * projection-head Dense kernels sharded over the ``model`` axis (TP);
    conv trunk + everything else replicated

XLA inserts the gradient ``psum`` over 'data' and the activation/weight
collectives over 'model'. The descriptor-set analog of sequence
parallelism (SURVEY.md §2) lives in the chunked encode cores
(ops/vlad.py, ops/fisher.py); the cluster-axis EP analog in
parallel/sharded.py.
"""
from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.siamese import SiameseEmbedder, TrainState, create_train_state, train_step
from .mesh import data_sharding, replicated

__all__ = ["make_sharded_trainer", "shard_train_state"]


def _param_spec(path, leaf) -> P:
    """Partition rule: shard Dense kernels column-wise over 'model'; keep
    conv trunk and small params replicated."""
    names = [getattr(p, "key", str(p)) for p in path]
    if any("Dense" in n for n in names) and leaf.ndim == 2:
        return P(None, "model")
    return P()


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Apply TP/replicated shardings to a TrainState's pytrees."""
    has_model = "model" in mesh.axis_names

    def put(path, leaf):
        spec = _param_spec(path, leaf) if has_model else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    params = jax.tree_util.tree_map_with_path(put, state.params)
    opt_state = jax.tree_util.tree_map_with_path(
        lambda p, l: jax.device_put(l, NamedSharding(mesh, P()))
        if not hasattr(l, "ndim") or l.ndim != 2
        else put(p, l),
        state.opt_state,
    )
    return TrainState(params=params, opt_state=opt_state, step=state.step)


def make_sharded_trainer(
    mesh: Mesh,
    *,
    cfg_name: str = "vgg11",
    embed_dim: int = 128,
    trunk_convs: int | None = None,
    image_size: int = 64,
    learning_rate: float = 1e-3,
    loss: str = "nt_xent",
    seed: int = 0,
    n_classes: int | None = None,
    **loss_kwargs,
):
    """Build (model, sharded TrainState, jitted step_fn).

    ``step_fn(state, images, labels) -> (state, loss)`` expects images
    ``(B, S, S, 3)`` float in [0, 1] with B divisible by the 'data' axis.
    """
    model = SiameseEmbedder(
        cfg_name=cfg_name, embed_dim=embed_dim, trunk_convs=trunk_convs,
        n_classes=n_classes,
    )
    optimizer = optax.adamw(learning_rate)
    state = create_train_state(model, optimizer, image_size=image_size, seed=seed)
    state = shard_train_state(state, mesh)

    step = train_step(model, optimizer, loss=loss, **loss_kwargs)
    step_fn = jax.jit(
        step,
        in_shardings=(
            None,  # state keeps its existing (TP/replicated) shardings
            data_sharding(mesh, 4),
            data_sharding(mesh, 1),
        ),
    )
    return model, state, step_fn
