"""Datasets (reference parity: pyvisim/datasets/__init__.py:1), plus
synthetic stand-in corpora for download-blocked environments."""
from .datasets import OxfordFlowerDataset, download_oxford_flowers_data
from .synthetic import expand_encodings, make_class_images, make_retrieval_corpus

__all__ = [
    "OxfordFlowerDataset",
    "download_oxford_flowers_data",
    "make_class_images",
    "make_retrieval_corpus",
    "expand_encodings",
]
