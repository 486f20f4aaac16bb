"""RetrievalIndex: a device-resident gallery index for serving.

The reference's retrieval path is an ad-hoc dict of host numpy vectors
re-scored per query in Python (reference pyvisim/eval.py:13-46,
_base_encoder.py:344-359). For production serving this module keeps the
encoded gallery L2-normalized and resident in device HBM (optionally
sharded over a mesh), so a query is a single jitted
encode → matmul → ``lax.top_k`` round trip.
"""
from __future__ import annotations

from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ._config import get_logger

logger = get_logger("index")

__all__ = ["RetrievalIndex"]


class RetrievalIndex:
    """Normalized gallery matrix + paths/labels with a jitted top-k query.

    :param vectors: (N, D) gallery encodings (host or device array).
    :param paths: N identifiers (file paths or ids).
    :param labels: optional N integer labels.
    :param mesh: optional mesh; gallery rows are then sharded over 'data'.
    :param quantize: None (float32 gallery) or "int8" — symmetric per-row
        int8 quantization of the normalized gallery (4x HBM density; the
        query matmul runs on the int8 MXU path with per-row rescaling).
    """

    def __init__(
        self,
        vectors: np.ndarray,
        paths: Sequence[str],
        labels: Sequence[int] | None = None,
        mesh=None,
        quantize: str | None = None,
    ):
        vectors = jnp.asarray(vectors, jnp.float32)
        if vectors.ndim != 2 or len(paths) != vectors.shape[0]:
            raise ValueError(
                f"vectors must be (N, D) with N == len(paths); got "
                f"{vectors.shape} and {len(paths)} paths"
            )
        if quantize not in (None, "int8"):
            raise ValueError(f"Unknown quantize mode: {quantize!r}")
        norms = jnp.linalg.norm(vectors, axis=1, keepdims=True)
        vectors = vectors / jnp.where(norms == 0, 1.0, norms)

        scales = None
        if quantize == "int8":
            max_abs = jnp.maximum(jnp.max(jnp.abs(vectors), axis=1, keepdims=True), 1e-12)
            scales = max_abs / 127.0  # dequant factor per row
            vectors = jnp.clip(
                jnp.round(vectors / scales), -127, 127
            ).astype(jnp.int8)

        self._n = vectors.shape[0]
        self.quantize = quantize
        self.paths = list(paths)
        self.labels = None if labels is None else np.asarray(labels)
        self.mesh = mesh
        self._place(vectors, scales)

        from functools import partial

        # The gallery is passed as a jit argument, not closed over — a
        # closed-over concrete array would be baked into the HLO as a
        # (potentially multi-GB) constant. The live row count ``n`` is a
        # traced argument so capacity padding (``add``) and sharding
        # padding share one mask and appends don't retrace.
        @partial(jax.jit, static_argnames=("k",))
        def _query_impl(q, gallery, scales, n, k):
            qn = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            if gallery.dtype == jnp.int8:
                # int8 MXU path: quantize the query symmetrically, dot in
                # int32, rescale by both sides' scales.
                q_max = jnp.maximum(jnp.max(jnp.abs(qn), axis=1, keepdims=True), 1e-12)
                q_scale = q_max / 127.0
                q8 = jnp.clip(jnp.round(qn / q_scale), -127, 127).astype(jnp.int8)
                acc = jnp.dot(q8, gallery.T, preferred_element_type=jnp.int32)
                sims = acc.astype(jnp.float32) * q_scale * scales.T
            else:
                sims = jnp.dot(qn, gallery.T, preferred_element_type=jnp.float32)
            sims = jnp.where(jnp.arange(sims.shape[1]) < n, sims, -jnp.inf)
            return jax.lax.top_k(sims, k)

        self._query = lambda q, k: _query_impl(
            q, self.vectors, self.scales, self._n, k
        )

    def _place(self, vectors, scales):
        """Pad the (n, D) normalized/quantized gallery to capacity and
        (re-)place it on device. Capacity grows in powers of two so
        ``add`` amortizes recompiles of the shape-specialized query; the
        query masks rows >= the live count."""
        n = vectors.shape[0]
        cap = 1 << max(0, (max(n, 1) - 1).bit_length())
        if self.mesh is not None:
            cap = -(-cap // self.mesh.shape["data"]) * self.mesh.shape["data"]
        if cap != n:
            vectors = jnp.concatenate(
                [vectors, jnp.zeros((cap - n,) + vectors.shape[1:],
                                    vectors.dtype)]
            )
            if scales is not None:
                scales = jnp.concatenate(
                    [scales, jnp.ones((cap - n, 1), scales.dtype)]
                )
        if self.mesh is not None:
            from .parallel import data_sharding

            vectors = jax.device_put(vectors, data_sharding(self.mesh, 2))
            if scales is not None:
                scales = jax.device_put(scales, data_sharding(self.mesh, 2))
        self.vectors = vectors
        self.scales = scales

    def add(
        self,
        vectors: np.ndarray,
        paths: Sequence[str],
        labels: Sequence[int] | None = None,
    ) -> None:
        """Append gallery rows to a live index (streaming ingest).

        New rows are L2-normalized (and int8-quantized in quantize="int8"
        mode — existing rows keep their original codes/scales) and
        concatenated ON DEVICE; capacity grows in powers of two so the
        shape-specialized query only recompiles at doublings. The
        reference has no serving index at all, so this is TPU-native
        surplus surface (anchor: its per-query rescoring loop,
        pyvisim/eval.py:13-46).
        """
        new = jnp.asarray(vectors, jnp.float32)
        if new.ndim != 2 or new.shape[0] != len(paths):
            raise ValueError(
                f"vectors must be (N, D) with N == len(paths); got "
                f"{new.shape} and {len(paths)} paths"
            )
        if (self.labels is None) != (labels is None):
            raise ValueError(
                "labels must be provided iff the index was built with labels"
            )
        norms = jnp.linalg.norm(new, axis=1, keepdims=True)
        new = new / jnp.where(norms == 0, 1.0, norms)
        new_scales = None
        if self.quantize == "int8":
            max_abs = jnp.maximum(
                jnp.max(jnp.abs(new), axis=1, keepdims=True), 1e-12
            )
            new_scales = max_abs / 127.0
            new = jnp.clip(
                jnp.round(new / new_scales), -127, 127
            ).astype(jnp.int8)
        live = self.vectors[: self._n]
        merged = jnp.concatenate([live, new])
        merged_scales = None
        if self.quantize == "int8":
            merged_scales = jnp.concatenate(
                [self.scales[: self._n], new_scales]
            )
        self._n = merged.shape[0]
        self.paths.extend(paths)
        if labels is not None:
            self.labels = np.concatenate(
                [self.labels, np.asarray(labels)]
            )
        self._place(merged, merged_scales)

    @classmethod
    def build(
        cls,
        encoder,
        image_paths: Iterable[str],
        labels: Sequence[int] | None = None,
        batch_size: int = 64,
        mesh=None,
    ) -> "RetrievalIndex":
        """Encode a gallery from image files (decoded through the host IO
        layer) into an index."""
        from .io import imread_rgb

        paths = list(image_paths)
        chunks = []
        for start in range(0, len(paths), batch_size):
            imgs = [imread_rgb(p) for p in paths[start : start + batch_size]]
            chunks.append(np.asarray(encoder.encode(imgs)))
        vectors = np.vstack(chunks)
        logger.info("indexed %d images (%d-D)", len(paths), vectors.shape[1])
        return cls(vectors, paths, labels, mesh=mesh)

    @classmethod
    def from_encoding_map(
        cls, encoding_map, labels=None, mesh=None, quantize=None
    ) -> "RetrievalIndex":
        """Adapter from the reference-style ``{path: vector}`` dict, or
        from the HDF5 path written by
        ``generate_encoding_map(save_path=...)``."""
        from .eval import _gallery

        paths, vectors = _gallery(encoding_map)
        return cls(vectors, paths, labels, mesh=mesh, quantize=quantize)

    def __len__(self) -> int:
        return self._n

    def query_vectors(self, query_vecs: np.ndarray, k: int = 5):
        """(Q, D) query encodings -> (scores (Q, k), indices (Q, k))."""
        q = jnp.atleast_2d(jnp.asarray(query_vecs, jnp.float32))
        k = min(k, self._n)
        scores, idx = self._query(q, k)
        return np.asarray(scores), np.asarray(idx)

    def query(self, encoder, images, k: int = 5):
        """Encode query images and search -> list (per query) of
        ``[(path, score), ...]`` descending — the serving analog of the
        reference's ``retrieve_top_k_similar`` (eval.py:13-46)."""
        vecs = np.asarray(encoder.encode(images))
        if vecs.ndim == 1:
            vecs = vecs[None]
        scores, idx = self.query_vectors(vecs, k)
        return [
            [(self.paths[j], float(s)) for j, s in zip(row_i, row_s)]
            for row_i, row_s in zip(idx, scores)
        ]

    # -- persistence --------------------------------------------------------
    def save(self, path: str) -> None:
        """Persist vectors/paths/labels (and int8 scales) to .npz."""
        extra = {}
        if self.quantize == "int8":
            extra["scales"] = np.asarray(self.scales)[: self._n]
        np.savez(
            path,
            vectors=np.asarray(self.vectors)[: self._n],
            paths=np.array(self.paths),
            labels=(
                np.array([], np.int64) if self.labels is None else self.labels
            ),
            **extra,
        )

    @classmethod
    def load(cls, path: str, mesh=None) -> "RetrievalIndex":
        with np.load(path, allow_pickle=False) as data:
            labels = data["labels"] if data["labels"].size else None
            vectors = data["vectors"]
            if vectors.dtype == np.int8:
                # rebuild the float gallery, then requantize (cheap, exact
                # round trip since rows were already normalized)
                vectors = vectors.astype(np.float32) * data["scales"]
                return cls(
                    vectors, [str(p) for p in data["paths"]], labels,
                    mesh=mesh, quantize="int8",
                )
            return cls(
                vectors, [str(p) for p in data["paths"]], labels, mesh=mesh
            )
