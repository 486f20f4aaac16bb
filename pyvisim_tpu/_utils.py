"""Utility grab-bag: math/similarity, clustering evaluation, persistence,
plotting, and misc helpers.

Capability parity with reference pyvisim/_utils.py (921 LoC, inventory rows
5-9 in SURVEY.md §2), with the compute-heavy pieces (cosine similarity,
K-Means/spectral clustering, Gaussian blur, soft-dice) running TPU-native
via pyvisim_tpu.ops. Matplotlib/seaborn plotting and HDF5/JSON persistence
stay host-side by nature.
"""
from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass
from typing import Any, Literal, Optional

import jax.numpy as jnp
import numpy as np

from ._config import get_logger
from ._validation import check_is_image, is_numpy_image, is_torch_image
from .ops.similarity import cosine_similarity_matrix

logger = get_logger("utils")

__all__ = [
    "is_numpy_image",
    "is_torch_image",
    "check_is_image",
    "cosine_similarity",
    "cluster_and_return_labels",
    "cluster_images_and_generate_statistics",
    "clustering_scores",
    "mean_below_diagonal",
    "soft_dice_score",
    "standardize_data",
    "save_json",
    "save_to_hdf5",
    "load_hdf5",
    "save_model",
    "load_model",
    "fit_regression_line",
    "get_statistics",
    "plot_and_save_heatmap",
    "plot_and_save_barplot",
    "plot_and_save_lineplot",
    "plot_and_save_histogram",
    "plot_boxplot_with_regression",
    "plot_scatter_with_regression",
    "plot_image",
    "gaussian_blur",
    "copy_or_move_images",
    "is_subset",
    "list_is_unique",
    "convert_to_integers",
    "average",
]


# ---------------------------------------------------------------------------
# Math / similarity (parity: _utils.py:273-330, 818-827)
# ---------------------------------------------------------------------------
def cosine_similarity(x, y) -> np.ndarray:
    """Cosine similarity matrix between two batches of vectors.

    Parity with reference _utils.py:312-330: 1-D inputs are reshaped to
    (1, D); inputs with D <= 1 are rejected; torch tensors accepted and
    converted. Computation runs on TPU via ops.similarity.
    """
    x = _to_numpy(x)
    y = _to_numpy(y)
    x = x.reshape(1, -1) if x.ndim == 1 else x
    y = y.reshape(1, -1) if y.ndim == 1 else y
    if x.shape[-1] <= 1 or y.shape[-1] <= 1:
        raise ValueError(
            f"Cosine similarity requires at least 2 features. Got {x.shape[-1]} "
            f"features for x and {y.shape[-1]} features for y."
        )
    return np.asarray(cosine_similarity_matrix(x, y))


def _to_numpy(a) -> np.ndarray:
    if isinstance(a, np.ndarray):
        return a
    if isinstance(a, jnp.ndarray):
        return np.asarray(a)
    try:
        import torch

        if torch.is_tensor(a):
            return a.cpu().numpy()
    except ImportError:
        pass
    return np.asarray(a)


def mean_below_diagonal(matrix: np.ndarray) -> float:
    """Mean of elements strictly below the diagonal
    (parity: _utils.py:273-282)."""
    below = matrix[np.tril_indices_from(matrix, k=-1)]
    return float(below.mean())


def standardize_data(data: np.ndarray, axis: int = 0) -> np.ndarray:
    """(x - mean) / std along ``axis`` (parity: _utils.py:818-827)."""
    return (data - np.mean(data, axis=axis, keepdims=True)) / np.std(
        data, axis=axis, keepdims=True
    )


def soft_dice_score(
    output,
    target,
    smooth: float = 0.0,
    eps: float = 1e-7,
    dims=None,
):
    """Soft Dice score (parity: _utils.py:285-309) for jnp/numpy arrays.

    Accepts torch tensors too (converted); returns a jnp array.
    """
    output = jnp.asarray(_to_numpy(output))
    target = jnp.asarray(_to_numpy(target))
    assert output.shape == target.shape
    if dims is not None:
        intersection = jnp.sum(output * target, axis=dims)
        cardinality = jnp.sum(output + target, axis=dims)
    else:
        intersection = jnp.sum(output * target)
        cardinality = jnp.sum(output + target)
    return (2.0 * intersection + smooth) / jnp.maximum(cardinality + smooth, eps)


def average(matrix) -> float:
    """Mean of a matrix of any supported array type
    (parity: _utils.py:873-881)."""
    return float(np.mean(_to_numpy(matrix)))


# ---------------------------------------------------------------------------
# Clustering evaluation (parity: _utils.py:128-162, 333-361)
# ---------------------------------------------------------------------------
def cluster_and_return_labels(
    data: np.ndarray,
    method: Literal["kmeans", "dbscan", "spectral"] = "kmeans",
    n_clusters: Optional[int] = None,
    **kwargs,
) -> np.ndarray:
    """Cluster ``data (N, D)`` and return integer labels ``(N,)``.

    Parity with reference _utils.py:128-162 (fixed random_state=42
    semantics become a fixed seed). 'kmeans' and 'spectral' run TPU-native
    (ops.kmeans / ops.spectral); 'dbscan' delegates host-side to sklearn —
    it is an eval-only path with data-dependent output structure that has
    no efficient static-shape formulation (SURVEY.md §2).
    """
    if method == "kmeans":
        if n_clusters is None:
            raise ValueError("n_clusters must be specified for KMeans.")
        from .ops.kmeans import kmeans_fit
        from .ops.assign import nearest_centroid

        seed = kwargs.pop("seed", 42)
        n_init = kwargs.pop("n_init", 3)
        cb, _ = kmeans_fit(
            jnp.asarray(data, jnp.float32), n_clusters, seed=seed, n_init=n_init, **kwargs
        )
        return np.asarray(nearest_centroid(jnp.asarray(data, jnp.float32), cb.centers))

    if method == "dbscan":
        from sklearn.cluster import DBSCAN

        return DBSCAN(**kwargs).fit_predict(data)

    if method == "spectral":
        if n_clusters is None:
            raise ValueError("n_clusters must be specified for Spectral Clustering.")
        from .ops.spectral import spectral_cluster

        seed = kwargs.pop("seed", 42)
        return np.asarray(
            spectral_cluster(jnp.asarray(data, jnp.float32), n_clusters, seed=seed, **kwargs)
        )

    raise ValueError(f"Unknown method: {method}")


def clustering_scores(true_labels, cluster_labels) -> dict[str, float]:
    """RI / ARI / 'NMI' scores.

    Parity note: the reference's 'nmi' key is actually sklearn's
    *adjusted* mutual info score (_utils.py:356-360) — we keep that
    behavior for baseline comparability.
    """
    from sklearn.metrics import (
        adjusted_mutual_info_score,
        adjusted_rand_score,
        rand_score,
    )

    return {
        "ri": rand_score(true_labels, cluster_labels),
        "ari": adjusted_rand_score(true_labels, cluster_labels),
        "nmi": adjusted_mutual_info_score(true_labels, cluster_labels),
    }


def cluster_images_and_generate_statistics(
    features: np.ndarray,
    true_labels: np.ndarray,
    n_clusters: int,
    method: str = "kmeans",
    **kwargs,
) -> dict[str, float]:
    """Cluster features and compute RI/ARI/NMI
    (parity: _utils.py:333-361)."""
    cluster_labels = cluster_and_return_labels(
        data=features,
        method=method,
        n_clusters=n_clusters if method != "dbscan" else None,
        **kwargs,
    )
    return clustering_scores(true_labels, cluster_labels)


# ---------------------------------------------------------------------------
# Persistence (parity: _utils.py:177-270, 830-850)
# ---------------------------------------------------------------------------
def save_json(file_path: str, data: dict) -> None:
    """Save a dict as JSON (parity: _utils.py:177-185)."""
    with open(file_path, "w") as f:
        json.dump(data, f, indent=4)


def save_model(model, file_path: str) -> None:
    """Persist a model artifact.

    Codebook pytrees go to safe ``.npz`` (preferred); anything else falls
    back to joblib for reference compatibility (_utils.py:830-840).
    """
    from .ops.codebooks import GmmCodebook, KMeansCodebook, PcaProjector, save_codebook

    if isinstance(model, (GmmCodebook, KMeansCodebook, PcaProjector)):
        save_codebook(file_path, model)
        return
    import joblib

    with open(file_path, "wb") as f:
        joblib.dump(model, f)


def load_model(file_path: str):
    """Load a model artifact saved by :func:`save_model` (or a reference
    joblib pickle, auto-converted to a codebook pytree when recognizable)."""
    if str(file_path).endswith(".npz"):
        from .ops.codebooks import load_codebook

        return load_codebook(file_path)
    import joblib

    with open(file_path, "rb") as f:
        obj = joblib.load(f)
    return _maybe_convert_sklearn(obj)


def _maybe_convert_sklearn(obj):
    from .ops.codebooks import GmmCodebook, KMeansCodebook, PcaProjector

    if hasattr(obj, "cluster_centers_"):
        return KMeansCodebook.from_sklearn(obj)
    if hasattr(obj, "covariances_"):
        return GmmCodebook.from_sklearn(obj)
    if hasattr(obj, "components_"):
        return PcaProjector.from_sklearn(obj)
    return obj


def save_to_hdf5(file_path: str, dataset_dict: dict[str, Any]) -> None:
    """Recursive dict -> HDF5 (parity: _utils.py:188-241). Supports
    int/float/ndarray/jnp array/torch tensor/str/bytes/list/nested dict."""
    import h5py

    def _save(d: dict, f) -> None:
        for name, data in d.items():
            if isinstance(data, dict):
                _save(data, f.create_group(name))
                continue
            if isinstance(data, (int, float)):
                f.create_dataset(name, data=data)
                continue
            data = _to_numpy(data) if not isinstance(data, (str, bytes, list)) else data
            if isinstance(data, np.ndarray):
                if data.dtype.kind in {"U", "S"}:
                    dt = h5py.string_dtype(encoding="utf-8")
                    f.create_dataset(name, data=data.astype(dt))
                else:
                    f.create_dataset(name, data=data)
            elif isinstance(data, list):
                arr = np.array(data)
                if arr.dtype.kind in {"U", "S"}:
                    dt = h5py.string_dtype(encoding="utf-8")
                    arr = arr.astype(dt)
                f.create_dataset(name, data=arr)
            elif isinstance(data, (str, bytes)):
                dt = h5py.string_dtype(encoding="utf-8")
                f.create_dataset(name, data=np.array([data], dtype=dt))
            else:
                raise TypeError(
                    f"Unsupported data type for dataset '{name}': {type(data)}"
                )

    with h5py.File(file_path, "w") as f:
        _save(dataset_dict, f)


def load_hdf5(file_path: str) -> dict[str, Any]:
    """HDF5 -> recursive dict (parity: _utils.py:243-270)."""
    import h5py

    def _load(f) -> dict:
        out: dict[str, Any] = {}
        for key, val in f.items():
            if isinstance(val, h5py.Group):
                out[key] = _load(val)
            else:
                if val.dtype.kind in {"U", "S"} or h5py.check_string_dtype(val.dtype):
                    out[key] = val.asstr()[...]
                elif val.shape == ():
                    out[key] = val[()]
                else:
                    out[key] = val[...]
        for k, v in f.attrs.items():
            out[k] = v
        return out

    with h5py.File(file_path, "r") as f:
        return _load(f)


# ---------------------------------------------------------------------------
# Regression / statistics helpers (parity: _utils.py:539-583)
# ---------------------------------------------------------------------------
@dataclass
class RegressionResult:
    predictions: np.ndarray
    coefficients: np.ndarray
    intercept: float
    mse: float


@dataclass
class Statistics:
    pearson: float
    spearman: float
    std: float
    mean: float
    median: float
    n_points: int


def fit_regression_line(x: np.ndarray, y: np.ndarray, poly_degree: int) -> RegressionResult:
    """Polynomial least-squares fit (parity: _utils.py:539-559), using
    numpy lstsq instead of sklearn LinearRegression."""
    features = np.vander(np.asarray(x, np.float64), N=poly_degree + 1, increasing=True)
    coef, *_ = np.linalg.lstsq(features, np.asarray(y, np.float64), rcond=None)
    predictions = features @ coef
    mse = float(np.mean((np.asarray(y) - predictions) ** 2))
    # sklearn convention: intercept separated, coef[0] (the constant) zeroed out
    return RegressionResult(predictions, np.r_[0.0, coef[1:]], float(coef[0]), mse)


def get_statistics(x: np.ndarray, y: np.ndarray) -> Statistics:
    """Pearson/Spearman + moments (parity: _utils.py:562-583)."""
    from scipy.stats import pearsonr, spearmanr

    pearson, _ = pearsonr(x, y)
    spearman, _ = spearmanr(x, y)
    return Statistics(
        float(pearson),
        float(spearman),
        float(np.std(y)),
        float(np.mean(y)),
        float(np.median(y)),
        int(len(y)),
    )


# ---------------------------------------------------------------------------
# Plotting (parity: _utils.py:364-536, 586-790, 908-919)
# ---------------------------------------------------------------------------
def plot_and_save_heatmap(
    matrix,
    figsize=None,
    x_tick_labels=None,
    y_tick_labels=None,
    cbar_kws=None,
    title="Heatmap",
    x_label="X Axis",
    y_label="Y Axis",
    show=True,
    save_fig_path=None,
) -> None:
    """Annotated heatmap (parity: _utils.py:364-402)."""
    import matplotlib.pyplot as plt
    import seaborn as sns

    matrix = _to_numpy(matrix)
    figsize = (len(matrix) * 0.7, len(matrix) * 0.7) if figsize is None else figsize
    plt.figure(figsize=figsize)
    sns.heatmap(
        matrix,
        annot=True,
        fmt=".2f",
        cmap="viridis",
        xticklabels=x_tick_labels if x_tick_labels else list(range(matrix.shape[1])),
        yticklabels=y_tick_labels if y_tick_labels else list(range(matrix.shape[0])),
        cbar_kws=cbar_kws if cbar_kws else {"label": "value"},
    )
    plt.title(title)
    plt.xlabel(x_label)
    plt.ylabel(y_label)
    if save_fig_path:
        plt.savefig(save_fig_path)
    if show:
        plt.show()
    plt.close()


def plot_and_save_barplot(
    data: dict[str, list[float]],
    bar_labels: list[str],
    title="Barplot",
    xlabel="X-axis",
    ylabel="Y-axis",
    save_path=None,
    show=True,
) -> None:
    """Grouped barplot (parity: _utils.py:404-450)."""
    import matplotlib.pyplot as plt

    x_labels = list(data.keys())
    values = list(data.values())
    num_groups = len(values[0])
    if not all(len(v) == num_groups for v in values):
        raise ValueError(
            "All lists in data must have the same length as the number of bar labels."
        )
    x = np.arange(len(x_labels))
    width = 0.8 / num_groups
    plt.figure(figsize=(10, 6))
    for i in range(num_groups):
        plt.bar(x + i * width, [v[i] for v in values], width, label=bar_labels[i])
    plt.title(title)
    plt.xlabel(xlabel)
    plt.ylabel(ylabel)
    plt.xticks(x + width * (num_groups - 1) / 2, x_labels)
    plt.legend()
    plt.grid(axis="y", linestyle="--", alpha=0.6)
    if save_path:
        plt.savefig(save_path)
    if show:
        plt.show()
    plt.close()


def plot_and_save_lineplot(
    y: np.ndarray,
    x: np.ndarray | None = None,
    y_lim=None,
    x_lim=None,
    save_path=None,
    sort_y=False,
    title="Lineplot",
    xlabel="x-axis",
    ylabel="y-axis",
    show=True,
) -> None:
    """Lineplot with <=20 x-ticks (parity: _utils.py:453-503)."""
    import matplotlib.pyplot as plt

    y = _to_numpy(y)
    if x is None:
        x = np.arange(len(y))
    if sort_y:
        y = np.sort(y)
    plt.figure(figsize=(10, 6))
    plt.plot(x, y, marker="o", linestyle="-", color="b")
    plt.title(title)
    plt.xlabel(xlabel)
    plt.ylabel(ylabel)
    plt.grid(True)
    if len(x) > 20:
        idx = np.linspace(0, len(x) - 1, 20, dtype=int)
        plt.xticks(idx, [x[i] for i in idx], rotation=90)
    if y_lim:
        plt.ylim(y_lim)
    if x_lim:
        plt.xlim(x_lim)
    plt.tight_layout()
    if save_path:
        plt.savefig(save_path)
    if show:
        plt.show()
    plt.close()


def plot_and_save_histogram(
    data: np.ndarray,
    num_bins: int = 10,
    title="Histogram",
    x_label="Value",
    y_label="Frequency",
    save_path=None,
    x_lim=(0, 1),
    show=True,
) -> None:
    """Histogram (parity: _utils.py:506-536)."""
    import matplotlib.pyplot as plt

    plt.figure(figsize=(10, 6))
    plt.hist(_to_numpy(data), bins=num_bins, color="blue", edgecolor="black", alpha=0.7)
    plt.title(title)
    plt.xlabel(x_label)
    plt.ylabel(y_label)
    plt.grid(axis="y", linestyle="--", alpha=0.6)
    if x_lim:
        plt.xlim(*x_lim)
    if save_path:
        plt.savefig(save_path)
    if show:
        plt.show()
    plt.close()


def plot_boxplot_with_regression(
    x: np.ndarray,
    y: np.ndarray,
    poly_degree: int = 1,
    x_lim=(0, 1),
    y_lim=(0, 1),
    num_bins: int = 20,
    title="Boxplot with Regression",
    x_label="IoU Difference",
    y_label="Similarity Score",
    save_fig_path=None,
    plot_bin_regression=False,
    verbose=False,
    return_results=False,
    show=True,
):
    """Binned boxplot + polynomial regression overlay
    (parity: _utils.py:586-727)."""
    import matplotlib.pyplot as plt

    x = _to_numpy(x)
    y = _to_numpy(y)
    lower, upper = x_lim
    bins = np.linspace(lower, upper, num_bins + 1)
    centers = 0.5 * (bins[:-1] + bins[1:])
    bin_idx = np.digitize(x, bins) - 1
    binned_y = [
        list(y[(bin_idx == i)]) or [np.nan] for i in range(num_bins)
    ]

    plt.figure(figsize=(12, 8))
    plt.boxplot(
        binned_y,
        positions=centers,
        widths=(upper - lower) / (num_bins * 2),
        patch_artist=True,
    )

    valid = ~np.isnan(x) & ~np.isnan(y)
    x_valid, y_valid = x[valid], y[valid]
    if len(x_valid) <= 1:
        raise ValueError(
            "Less than two data points are valid. Data is invalid for plotting."
        )
    reg = fit_regression_line(x_valid, y_valid, poly_degree)
    x_line = np.linspace(lower, upper, 100)
    y_line = np.polyval(reg.coefficients[::-1], x_line) + reg.intercept
    plt.plot(
        x_line, y_line, color="red", linewidth=2,
        label=f"Regression line (Degree {poly_degree})",
    )
    overall = get_statistics(x_valid, y_valid)
    plt.text(
        0.05, 0.95, f"Pearson Correlation: {overall.pearson:.2f}",
        transform=plt.gca().transAxes, fontsize=12, verticalalignment="top",
        bbox=dict(boxstyle="round", alpha=0.5),
    )
    plt.text(
        0.05, 0.90, f"MSE: {reg.mse:.4f}", transform=plt.gca().transAxes,
        fontsize=12, verticalalignment="top", bbox=dict(boxstyle="round", alpha=0.5),
    )

    per_bin_stats = []
    if plot_bin_regression or return_results:
        half = (upper - lower) / (2 * num_bins)
        for i in range(num_bins):
            m = (x_valid > centers[i] - half) & (x_valid <= centers[i] + half)
            if m.sum() > 1:
                br = fit_regression_line(x_valid[m], y_valid[m], 1)
                bs = get_statistics(x_valid[m], y_valid[m])
                per_bin_stats.append(
                    {"bin_index": i + 1, "bin_center": centers[i],
                     "bin_stats": bs, "regression": br}
                )
                if plot_bin_regression:
                    plt.plot(
                        x_valid[m], br.predictions,
                        label=f"Bin {i + 1} coeff: {br.coefficients[1]:.2f}",
                    )
                if verbose:
                    logger.info("bin %d: %s", i + 1, bs)

    plt.xticks(centers, [round(c, 2) for c in centers])
    plt.title(title)
    plt.xlabel(x_label)
    plt.xlim(lower, upper)
    plt.ylabel(y_label)
    plt.ylim(*y_lim)
    plt.legend()
    if save_fig_path:
        plt.savefig(save_fig_path)
    if show:
        plt.show()
    plt.close()
    if return_results:
        return {
            "overall_statistics": overall,
            "regression_result": reg,
            "per_bin_statistics": per_bin_stats,
        }


def plot_scatter_with_regression(
    x: np.ndarray,
    y: np.ndarray,
    x_lim=(0, 1),
    y_lim=(0, 1),
    title="Scatterplot with Regression",
    x_label="IoU Difference",
    y_label="Similarity Score",
    save_fig_path=None,
    show=True,
) -> None:
    """Scatter + linear regression (parity: _utils.py:730-790)."""
    import matplotlib.pyplot as plt

    x = _to_numpy(x)
    y = _to_numpy(y)
    lower, upper = x_lim
    valid = ~np.isnan(x) & ~np.isnan(y)
    x_valid, y_valid = x[valid], y[valid]
    plt.figure(figsize=(10, 6))
    plt.scatter(x_valid, y_valid, alpha=0.6, label="Data points")
    if len(x_valid) > 1:
        reg = fit_regression_line(x_valid, y_valid, 1)
        coeff = reg.coefficients[1]
        x_line = np.linspace(lower, upper, 100)
        plt.plot(
            x_line, reg.intercept + coeff * x_line, color="red", linewidth=2,
            label=f"Regression line, Coefficient: {coeff:.2f}",
        )
    else:
        logger.warning("Insufficient data points for regression.")
    plt.title(title)
    plt.xlabel(x_label)
    plt.xlim(*x_lim)
    plt.ylabel(y_label)
    plt.ylim(*y_lim)
    plt.legend()
    if save_fig_path:
        plt.savefig(save_fig_path)
    if show:
        plt.show()
    plt.close()


@check_is_image()
def plot_image(image, title: str | None = None) -> None:
    """Plot an image; CHW torch-layout arrays are transposed to HWC
    (parity: _utils.py:908-919)."""
    import matplotlib.pyplot as plt

    image = _to_numpy(image)
    if image.ndim == 3 and image.shape[0] == 3:
        image = np.transpose(image, (1, 2, 0))
    plt.imshow(image)
    plt.title(title)
    plt.axis("off")
    plt.show()


# ---------------------------------------------------------------------------
# Image ops / misc (parity: _utils.py:793-905)
# ---------------------------------------------------------------------------
@check_is_image()
def gaussian_blur(image, kernel_size: int | None = None, sigma: float = 1.0):
    """Gaussian blur with the reference's kernel-size constraints
    (parity: _utils.py:884-905), computed TPU-native via ops.gaussian.

    Torch CHW tensors are supported (converted, blurred, returned as
    numpy CHW clipped to [0, 1] like the reference's TF.gaussian_blur path).
    """
    if not kernel_size:
        kernel_size = 2 * int(3 * sigma) + 1
    min_k = 2 * int(3 * sigma) + 1
    max_k = 2 * int(5 * sigma) + 1
    if not min_k <= kernel_size <= max_k:
        raise ValueError(
            "Kernel radius must be between 2 * 3-5 times the standard deviation "
            f"plus one. In this case, it should be between {min_k} and {max_k} "
            f"Got kernel size: {kernel_size}"
        )
    from .ops.gaussian import gaussian_blur as _blur

    arr = _to_numpy(image)
    is_chw = arr.ndim == 3 and arr.shape[0] == 3
    if is_chw:
        arr = arr.transpose(1, 2, 0)
    out = np.asarray(_blur(jnp.asarray(arr, jnp.float32), sigma, kernel_size))
    if is_chw:
        out = out.transpose(2, 0, 1).clip(0.0, 1.0)
    elif isinstance(image, np.ndarray) and image.dtype == np.uint8:
        out = np.round(out).clip(0, 255).astype(np.uint8)
    return out


def copy_or_move_images(image_paths: list[str], directory: str, operation: str = "copy") -> None:
    """Copy or move images into a directory (parity: _utils.py:853-870)."""
    assert operation in ["copy", "cut"], "Invalid operation. Choose from ['copy', 'cut']"
    os.makedirs(directory, exist_ok=True)
    for image in image_paths:
        if operation == "copy":
            shutil.copy(image, directory)
        else:
            shutil.move(image, directory)


def is_subset(list1: list, list2: list) -> bool:
    """Is list1 a subset of list2 (parity: _utils.py:793-804)."""
    if len(list1) > len(list2):
        raise ValueError("List1 must be have smaller or equal length than list2")
    return set(list1).issubset(list2)


def list_is_unique(lst: list) -> bool:
    """Are all elements unique (parity: _utils.py:806-815, O(N) here)."""
    return len(set(lst)) == len(lst)


def convert_to_integers(list_of_tuples) -> list[tuple[int, int]]:
    """Float tuple list -> int tuple list (parity: _utils.py:843-850)."""
    return [(int(a), int(b)) for a, b in list_of_tuples]
