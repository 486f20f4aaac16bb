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
from .ops.similarity import pad_rows_for_mxu

logger = get_logger("index")

__all__ = ["RetrievalIndex"]


@jax.jit
def _normalize_rows(x):
    norms = jnp.linalg.norm(x, axis=1, keepdims=True)
    return x / jnp.where(norms == 0, 1.0, norms)


@jax.jit
def _quantize_rows(x):
    max_abs = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-12)
    scales = max_abs / 127.0
    return jnp.clip(jnp.round(x / scales), -127, 127).astype(jnp.int8), scales


def _append_rows_impl(buf, new, offset):
    return jax.lax.dynamic_update_slice(buf, new.astype(buf.dtype),
                                        (offset, 0))


# In-place append into the capacity-padded gallery buffer. Donating the
# buffer lets XLA update it without a second copy, so a streaming ``add``
# within capacity holds ONE gallery-sized buffer plus the new rows —
# the slice+concat+repad formulation held ~4 gallery copies at once and
# RESOURCE_EXHAUSTED on multi-GB galleries. The row offset is a traced
# scalar: appends at different fill levels reuse one compiled program.
_append_rows = jax.jit(_append_rows_impl, donate_argnums=(0,))


class RetrievalIndex:
    """Normalized gallery matrix + paths/labels with a jitted top-k query.

    :param vectors: (N, D) gallery encodings (host or device array).
    :param paths: N identifiers (file paths or ids).
    :param labels: optional N integer labels.
    :param mesh: optional mesh; gallery rows are then sharded over 'data'.
    :param quantize: None (float32 gallery) or "int8" — symmetric per-row
        int8 quantization of the normalized gallery (4x HBM density; the
        query matmul runs on the int8 MXU path with per-row rescaling).
    :param screen_dim: optional coarse-to-fine serving mode. The gallery
        is additionally stored under a Johnson-Lindenstrauss random
        projection to ``screen_dim`` dims (inner-product preserving, no
        training); a query first scans the small screen gallery, keeps the
        top ``rerank`` candidates, gathers ONLY their full-D rows and
        rescores them exactly. For the 131,584-D VLAD/FV encodings the
        scan stage reads ``D/screen_dim`` (~500x at 256) less HBM — the
        TPU-native answer to IVF-style serving indexes (two matmuls + one
        row gather instead of data-dependent cell probing, which XLA
        cannot tile).
    :param rerank: candidates rescored exactly per query in screen mode
        (default ``max(4*k, 128)`` at query time). Recall@k against the
        exact scan rises with ``rerank``; ``rerank >= len(index)`` is
        bit-identical to the exact path. Sizing (measured, docs/PERF.md
        "Serving-index recall on structured encodings"): on a
        manifold-dense VLAD gallery (6,149 rows expanded from real
        encodings, 5th-6th margins ~1e-3) recall@5-vs-exact is 0.95 at
        rerank=64 and saturates at 0.99 from rerank=128 — hence the 128
        default; galleries of distinct images have wider margins and 64
        often suffices. Cost guidance (docs/PERF.md "Serving-index
        modes"): the re-rank row gather moves bytes ~15x slower than the
        exact scan's streaming matmul, so screening wins when
        ``Q * rerank`` is well under ``n / 15`` — the single-query /
        large-gallery serving regime; for large query batches or
        ``rerank`` a sizable fraction of ``n``, prefer the exact (or
        int8) scan (``auto_exact`` routes there by itself).
    :param auto_exact: (default True) queries on a screened index route
        to the exact full scan whenever ``Q * rerank * 15 >= n`` — past
        that measured crossover the exact scan is FASTER, and it is
        never lower recall (the screened path's only error mode is
        missing candidates the exact scan scores). Set False to force
        the screened kernel regardless of shape (benchmarks, tests).
    """

    def __init__(
        self,
        vectors: np.ndarray,
        paths: Sequence[str],
        labels: Sequence[int] | None = None,
        mesh=None,
        quantize: str | None = None,
        screen_dim: int | None = None,
        rerank: int | None = None,
        auto_exact: bool = True,
        _assume_normalized: bool = False,
    ):
        vectors = jnp.asarray(vectors, jnp.float32)
        if vectors.ndim != 2 or len(paths) != vectors.shape[0]:
            raise ValueError(
                f"vectors must be (N, D) with N == len(paths); got "
                f"{vectors.shape} and {len(paths)} paths"
            )
        if quantize not in (None, "int8"):
            raise ValueError(f"Unknown quantize mode: {quantize!r}")
        if rerank is not None and screen_dim is None:
            raise ValueError("rerank= requires screen_dim=")
        if screen_dim is not None and screen_dim >= vectors.shape[1]:
            raise ValueError(
                f"screen_dim={screen_dim} must be < vector dim "
                f"{vectors.shape[1]} (screening only pays below full rank)"
            )
        if not _assume_normalized:
            vectors = _normalize_rows(vectors)

        self.screen_dim = screen_dim
        self.rerank = rerank
        self.auto_exact = auto_exact
        self._proj = None
        screen = None
        if screen_dim is not None:
            # JL projection: fixed-seed Gaussian, scaled so projected
            # inner products are unbiased estimates of the originals.
            # Seed-fixed => regenerable from (D, screen_dim) alone, so
            # save()/load() never persist it.
            key = jax.random.PRNGKey(0)
            self._proj = jax.random.normal(
                key, (vectors.shape[1], screen_dim), jnp.float32
            ) / np.sqrt(screen_dim)
            screen = vectors @ self._proj

        scales = None
        if quantize == "int8":
            vectors, scales = _quantize_rows(vectors)

        self._n = vectors.shape[0]
        self.quantize = quantize
        self.paths = list(paths)
        self.labels = None if labels is None else np.asarray(labels)
        self.mesh = mesh
        self._place(vectors, scales, screen)

        from functools import partial

        def _gather_rows(gallery, cand):
            """(Q, r) row gather as an unrolled dynamic-slice scan.

            XLA's native gather moves these wide rows at ~2.5 GB/s on
            TPU (measured 13 ms for 64 x 526 KB rows of the 131,584-D
            gallery); a scan of per-row DMA slices with unroll=4 runs
            the same gather in 0.47 ms (27x) — each unrolled iteration
            issues an independent row DMA the scheduler can overlap.
            """
            flat = cand.reshape(-1)

            def body(carry, i):
                return carry, jax.lax.dynamic_slice_in_dim(
                    gallery, i, 1, axis=0
                )[0]

            _, rows = jax.lax.scan(body, None, flat, unroll=4)
            return rows.reshape(cand.shape + (gallery.shape[1],))

        def _exact_row_scores(qn, rows, row_scales):
            """Exact cosine of each query against ITS OWN gathered
            candidate rows: (Q, D) x (Q, R, D[int8]) -> (Q, R)."""
            if rows.dtype == jnp.int8:
                vals = rows.astype(jnp.float32) * row_scales
            else:
                vals = rows
            return jnp.einsum(
                "qd,qrd->qr", qn, vals, preferred_element_type=jnp.float32
            )

        # The gallery is passed as a jit argument, not closed over — a
        # closed-over concrete array would be baked into the HLO as a
        # (potentially multi-GB) constant. The live row count ``n`` is a
        # traced argument so capacity padding (``add``) and sharding
        # padding share one mask and appends don't retrace.
        @partial(jax.jit, static_argnames=("k", "r"))
        def _query_impl(q, gallery, scales, screen_gal, proj, n, k, r):
            # MXU row padding (ops.similarity.pad_rows_for_mxu), INSIDE
            # the jit (shapes are static here; doing it eagerly costs ~3
            # extra ~1 ms relay dispatches) — only where the full f32
            # gallery is scanned: the int8 scan and the screened paths
            # don't pay the tile-under-fill cliff, and padding would 8x
            # the screened gather traffic.
            q0 = q.shape[0]
            if r is None and gallery.dtype != jnp.int8:
                q, q0 = pad_rows_for_mxu(q)
            qn = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            if r is not None:
                # coarse-to-fine: scan the JL screen gallery, gather the
                # top-r candidates' full rows, rescore exactly.
                qs = qn @ proj
                sims_s = jnp.dot(
                    qs, screen_gal.T, preferred_element_type=jnp.float32
                )
                sims_s = jnp.where(
                    jnp.arange(sims_s.shape[1]) < n, sims_s, -jnp.inf
                )
                _, cand = jax.lax.top_k(sims_s, r)  # (Q, r)
                rows = _gather_rows(gallery, cand)  # (Q, r, D)
                row_scales = (
                    jnp.take(scales, cand, axis=0) if scales is not None
                    else None
                )
                exact = _exact_row_scores(qn, rows, row_scales)
                exact = jnp.where(cand < n, exact, -jnp.inf)
                sc, pos = jax.lax.top_k(exact, k)
                return sc, jnp.take_along_axis(cand, pos, axis=1)
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
            sc, ix = jax.lax.top_k(sims, k)
            return sc[:q0], ix[:q0]

        def _query(q, k):
            r = None
            if self.screen_dim is not None:
                r = self.rerank if self.rerank is not None else max(4 * k, 128)
                r = max(min(r, self._n), k)
                # Measured crossover (docs/PERF.md "Serving-index
                # modes"): the re-rank row gather moves bytes ~15x
                # slower than the exact scan's streaming matmul, so
                # past Q*r*15 >= n the exact scan is faster — and it is
                # never lower recall (screening's only error mode is
                # missing candidates the full scan scores). Route there.
                if self.auto_exact and q.shape[0] * r * 15 >= self._n:
                    r = None
            return _query_impl(
                q, self.vectors, self.scales, self._screen, self._proj,
                self._n, k, r,
            )

        self._query = _query

    def _place(self, vectors, scales, screen=None):
        """Pad the (n, D) normalized/quantized gallery (and the JL screen
        gallery, when screening) to capacity and (re-)place it on device.
        Capacity grows in powers of two so ``add`` amortizes recompiles of
        the shape-specialized query; the query masks rows >= the live
        count."""
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
            if screen is not None:
                screen = jnp.concatenate(
                    [screen, jnp.zeros((cap - n, screen.shape[1]),
                                       screen.dtype)]
                )
        if self.mesh is not None:
            from .parallel import data_sharding

            vectors = jax.device_put(vectors, data_sharding(self.mesh, 2))
            if scales is not None:
                scales = jax.device_put(scales, data_sharding(self.mesh, 2))
            if screen is not None:
                screen = jax.device_put(screen, data_sharding(self.mesh, 2))
        self.vectors = vectors
        self.scales = scales
        self._screen = screen

    def add(
        self,
        vectors: np.ndarray,
        paths: Sequence[str],
        labels: Sequence[int] | None = None,
    ) -> None:
        """Append gallery rows to a live index (streaming ingest).

        New rows are L2-normalized (and int8-quantized in quantize="int8"
        mode — existing rows keep their original codes/scales) and
        written ON DEVICE. Within capacity the rows are appended in
        place (``dynamic_update_slice`` with the buffer donated — one
        gallery-sized buffer alive, so multi-GB galleries stream without
        exhausting HBM); capacity grows in powers of two so copies and
        query recompiles happen only at doublings. The reference has no
        serving index at all, so this is TPU-native surplus surface
        (anchor: its per-query rescoring loop, pyvisim/eval.py:13-46).
        """
        new = jnp.asarray(vectors, jnp.float32)
        if new.ndim != 2 or new.shape[0] != len(paths):
            raise ValueError(
                f"vectors must be (N, D) with N == len(paths); got "
                f"{new.shape} and {len(paths)} paths"
            )
        if new.shape[1] != self.vectors.shape[1]:
            # dynamic_update_slice would legally accept a NARROWER update
            # and silently write corrupted partial rows — reject up front
            raise ValueError(
                f"vectors must match the index feature dim "
                f"{self.vectors.shape[1]}; got {new.shape[1]}"
            )
        if (self.labels is None) != (labels is None):
            raise ValueError(
                "labels must be provided iff the index was built with labels"
            )
        new = _normalize_rows(new)
        new_screen = None
        if self.screen_dim is not None:
            new_screen = new @ self._proj
        new_scales = None
        if self.quantize == "int8":
            new, new_scales = _quantize_rows(new)
        n0 = self._n
        total = n0 + new.shape[0]
        # Device state first, host bookkeeping (paths/labels/_n) last: a
        # failure below must not leave the index with _n ahead of the
        # actually-appended rows (index->path mapping would skew).
        if total <= self.vectors.shape[0]:
            # fits in capacity: in-place donated append, no copies
            self.vectors = _append_rows(self.vectors, new, n0)
            if new_scales is not None:
                self.scales = _append_rows(self.scales, new_scales, n0)
            if new_screen is not None:
                self._screen = _append_rows(self._screen, new_screen, n0)
        else:
            merged = jnp.concatenate([self.vectors[:n0], new])
            merged_scales = None
            if self.quantize == "int8":
                merged_scales = jnp.concatenate(
                    [self.scales[:n0], new_scales]
                )
            merged_screen = None
            if self.screen_dim is not None:
                merged_screen = jnp.concatenate(
                    [self._screen[:n0], new_screen]
                )
            self._place(merged, merged_scales, merged_screen)
        self.paths.extend(paths)
        if labels is not None:
            self.labels = np.concatenate([self.labels, np.asarray(labels)])
        self._n = total

    @classmethod
    def build(
        cls,
        encoder,
        image_paths: Iterable[str],
        labels: Sequence[int] | None = None,
        batch_size: int = 64,
        mesh=None,
        **index_kwargs,
    ) -> "RetrievalIndex":
        """Encode a gallery from image files (decoded through the host IO
        layer) into an index. ``index_kwargs`` (``quantize``,
        ``screen_dim``, ``rerank``) pass through to the constructor."""
        from .io import imread_rgb

        paths = list(image_paths)
        chunks = []
        for start in range(0, len(paths), batch_size):
            imgs = [imread_rgb(p) for p in paths[start : start + batch_size]]
            chunks.append(np.asarray(encoder.encode(imgs)))
        vectors = np.vstack(chunks)
        logger.info("indexed %d images (%d-D)", len(paths), vectors.shape[1])
        return cls(vectors, paths, labels, mesh=mesh, **index_kwargs)

    @classmethod
    def from_encoding_map(
        cls, encoding_map, labels=None, mesh=None, quantize=None,
        screen_dim=None, rerank=None, auto_exact=True,
    ) -> "RetrievalIndex":
        """Adapter from the reference-style ``{path: vector}`` dict, or
        from the HDF5 path written by
        ``generate_encoding_map(save_path=...)``."""
        from .eval import _gallery

        paths, vectors = _gallery(encoding_map)
        return cls(vectors, paths, labels, mesh=mesh, quantize=quantize,
                   screen_dim=screen_dim, rerank=rerank,
                   auto_exact=auto_exact)

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
        """Persist vectors/paths/labels (and int8 scales) to .npz. Screen
        mode stores only ``(screen_dim, rerank, auto_exact)`` — the
        seed-fixed JL projection and the screen gallery are regenerated
        at load."""
        extra = {}
        if self.quantize == "int8":
            extra["scales"] = np.asarray(self.scales)[: self._n]
        if self.screen_dim is not None:
            extra["screen"] = np.array(
                [self.screen_dim, self.rerank if self.rerank else 0,
                 int(self.auto_exact)],
                np.int64,
            )
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
            kw = {}
            if "screen" in data:
                kw["screen_dim"] = int(data["screen"][0])
                kw["rerank"] = int(data["screen"][1]) or None
                if data["screen"].size > 2:  # older files lack the flag
                    kw["auto_exact"] = bool(data["screen"][2])
            if vectors.dtype == np.int8:
                # Rebuild the float gallery, then requantize. The max
                # element of each row quantized to exactly +-127, so
                # max_abs(dequant) = 127*scale and requantization
                # reproduces the saved codes/scales EXACTLY — but only if
                # the dequantized rows are NOT re-normalized first (their
                # norm is 1 +- quantization error; renormalizing would
                # perturb every value and flip rounded codes).
                vectors = vectors.astype(np.float32) * data["scales"]
                return cls(
                    vectors, [str(p) for p in data["paths"]], labels,
                    mesh=mesh, quantize="int8", _assume_normalized=True,
                    **kw,
                )
            return cls(
                vectors, [str(p) for p in data["paths"]], labels, mesh=mesh,
                **kw,
            )
