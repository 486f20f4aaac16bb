"""Siamese embedding training with checkpoint/resume and multi-chip DP+TP.

The capability the reference only promised (pyvisim/neural_networks is a
README stub): train a metric-learning embedder with NT-Xent loss, sharded
over the device mesh, checkpointed with Orbax.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from pyvisim_tpu.checkpoint import save_train_state
from pyvisim_tpu.parallel import make_mesh, make_sharded_trainer


def main():
    mesh = make_mesh(axis_names=("data", "model"))
    model, state, step_fn = make_sharded_trainer(
        mesh,
        cfg_name="vgg11",
        embed_dim=64,
        image_size=64,
        loss="nt_xent",
        learning_rate=3e-4,
    )
    rng = np.random.default_rng(0)
    # fixed synthetic dataset: 8 classes, each a distinct noise texture
    class_base = rng.random((8, 64, 64, 3)).astype(np.float32)
    for step in range(30):
        labels = rng.integers(0, 8, size=32)
        images = np.clip(
            class_base[labels] + rng.normal(0, 0.1, (32, 64, 64, 3)), 0, 1
        ).astype(np.float32)
        state, loss = step_fn(state, jnp.asarray(images), jnp.asarray(labels))
        if step % 5 == 0:
            print(f"step {step}: loss={float(loss):.4f}")
    path = save_train_state("/tmp/siamese_ckpt", state)
    print("checkpointed to", path)


if __name__ == "__main__":
    main()
