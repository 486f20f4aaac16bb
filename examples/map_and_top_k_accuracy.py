"""Retrieval evaluation: mAP and top-k accuracy on Oxford Flowers-102.

Mirrors the reference's examples/m_ap_and_top_k_accuracy.ipynb: gallery =
train split (6,149 images, swapped-split semantics), queries = validation
+ test (2,040), VGG16 deep features with spatial encoding, k=256
vocabulary. Requires network access for the dataset download and a
converted torchvision VGG16 checkpoint for pretrained features.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from pyvisim_tpu.datasets import OxfordFlowerDataset
from pyvisim_tpu.encoders import VLADEncoder
from pyvisim_tpu.eval import top_k_accuracy, top_k_map
from pyvisim_tpu.features import DeepConvFeature
from pyvisim_tpu.profiling import Throughput


def main():
    train = OxfordFlowerDataset(purpose="train")
    queries = OxfordFlowerDataset(purpose=["validation", "test"])
    print(f"gallery={len(train)} queries={len(queries)}")

    # Pretrained VGG16: convert a torchvision checkpoint with
    # models.vgg.params_from_torch_state_dict(torch.load("vgg16.pth"))
    ext = DeepConvFeature()  # random init unless params are provided
    encoder = VLADEncoder(feature_extractor=ext)
    encoder.learn(
        [train[i][0] for i in range(0, len(train), 8)], n_clusters=256
    )

    meter = Throughput()
    emap = encoder.generate_encoding_map(train.image_paths, batch_size=128)
    meter.update(len(train))
    print(f"gallery encoded at {meter.rate:.0f} img/s")

    path_labels = dict(zip(train.image_paths, train.labels))
    q_imgs = [queries[i][0] for i in range(len(queries))]
    top1 = top_k_accuracy(q_imgs, queries.labels, emap, path_labels, encoder, k=1)
    top5 = top_k_accuracy(q_imgs, queries.labels, emap, path_labels, encoder, k=5)
    m = top_k_map(q_imgs, queries.labels, emap, path_labels, encoder, k=5)
    print(f"top-1={top1:.4f} top-5={top5:.4f} mAP@5={m:.4f}")
    # Reference baselines (pretrained weights): top-1 0.6975, top-5 0.8672


if __name__ == "__main__":
    main()
