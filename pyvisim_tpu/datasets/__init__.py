"""Datasets (reference parity: pyvisim/datasets/__init__.py:1)."""
from .datasets import OxfordFlowerDataset, download_oxford_flowers_data

__all__ = ["OxfordFlowerDataset", "download_oxford_flowers_data"]
