"""Neural networks: the Siamese embedding network.

The reference's pyvisim/neural_networks is a README-only stub
("TODO: Implement Siamese Network"); the implemented capability lives in
pyvisim_tpu.models.siamese and is re-exported here for layout parity.
"""
from ..models.siamese import (
    SiameseEmbedder,
    TrainState,
    create_train_state,
    embed,
    train_step,
)

__all__ = ["SiameseEmbedder", "TrainState", "create_train_state", "train_step", "embed"]
