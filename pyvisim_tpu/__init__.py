"""pyvisim_tpu — TPU-native image-similarity framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
MechaCritter/Python-Visual-Similarity (pyvisim v0.1.3): VLAD and Fisher
Vector descriptor-aggregation encoders over SIFT / RootSIFT / deep-CNN
features, with PCA, multi-encoder pipelines, retrieval evaluation, the
Oxford Flowers-102 dataset, on-TPU vocabulary training (KMeans/GMM/PCA),
segmentation losses and a Siamese embedding head.

Public subpackages mirror the reference's layout
(reference: pyvisim/__init__.py:1-4):
``datasets``, ``encoders``, ``features``, ``eval`` — plus the new
TPU-native layers ``ops``, ``models``, ``parallel``.
"""

__version__ = "0.1.0"

__all__ = [
    "datasets",
    "encoders",
    "features",
    "eval",
    "ops",
    "models",
    "parallel",
    "losses",
    "neural_networks",
    "io",
    "profiling",
    "checkpoint",
    "index",
]


def __getattr__(name):
    # Lazy subpackage imports: `import pyvisim_tpu` stays light (no cv2 /
    # flax / h5py import cost) while `pyvisim_tpu.encoders` still resolves.
    if name in __all__:
        import importlib

        module = importlib.import_module(f".{name}", __name__)
        globals()[name] = module
        return module
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
