"""Siamese embedding training with checkpoint/resume and multi-chip DP+TP.

The capability the reference only promised (pyvisim/neural_networks is a
README stub): train a metric-learning embedder with NT-Xent loss, sharded
over the device mesh, checkpointed with Orbax.
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

# PYVISIM_EXAMPLE_FAST=1 shrinks the problem so the script doubles as a
# CPU-sized smoke test (tests/test_examples.py); the flow is identical.
FAST = bool(os.environ.get("PYVISIM_EXAMPLE_FAST"))
import jax.numpy as jnp

from pyvisim_tpu.checkpoint import save_train_state
from pyvisim_tpu.parallel import make_mesh, make_sharded_trainer


def main():
    size, steps, batch = (32, 5, 8) if FAST else (64, 30, 32)
    mesh = make_mesh(axis_names=("data", "model"))
    model, state, step_fn = make_sharded_trainer(
        mesh,
        cfg_name="vgg11",
        embed_dim=64,
        image_size=size,
        loss="nt_xent",
        learning_rate=3e-4,
    )
    rng = np.random.default_rng(0)
    # fixed synthetic dataset: 8 classes, each a distinct noise texture
    class_base = rng.random((8, size, size, 3)).astype(np.float32)
    for step in range(steps):
        labels = rng.integers(0, 8, size=batch)
        images = np.clip(
            class_base[labels] + rng.normal(0, 0.1, (batch, size, size, 3)), 0, 1
        ).astype(np.float32)
        state, loss = step_fn(state, jnp.asarray(images), jnp.asarray(labels))
        if step % 5 == 0:
            print(f"step {step}: loss={float(loss):.4f}")
    path = save_train_state("/tmp/siamese_ckpt", state)
    print("checkpointed to", path)


if __name__ == "__main__":
    main()
