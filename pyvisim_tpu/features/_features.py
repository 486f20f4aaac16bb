"""Feature extractors: SIFT, RootSIFT, Lambda, DeepConvFeature.

Capability parity with reference pyvisim/features/_features.py (306 LoC),
redesigned TPU-first:

* ``DeepConvFeature`` runs a jit-compiled Flax VGG trunk (models/vgg.py)
  instead of torch forward hooks, with a fully batched device path.
* ``SIFT``/``RootSIFT`` support two backends: ``"tpu"`` (batched JAX/Pallas
  pipeline in ops/sift.py, fixed keypoint budget + masks) and ``"opencv"``
  (host golden reference used for cross-validation). The extractor object
  is stateless/reentrant — unlike the reference's shared hook ``buffer``
  (reference: _features.py:260, a documented thread-safety hazard).
"""
from __future__ import annotations

from functools import wraps
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from .._base_classes import FeatureExtractorBase
from .._config import get_logger
from ..models import vgg as vgg_lib

logger = get_logger("features")

__all__ = ["SIFT", "RootSIFT", "Lambda", "DeepConvFeature", "FeatureExtractorBase"]

# Ragged-preprocessing machinery shared with SiameseEncoder (ops/resize.py).
from ..ops.resize import bucket_side as _bucket_side  # noqa: E402
from ..ops.resize import masked_linear_resize as _masked_linear_resize  # noqa: E402


def _check_output_shape(func) -> Callable:
    """Ensure extractor output is a 2-D numpy array of shape (N, output_dim).

    Mirrors reference _features.py:24-51: ``None`` becomes a (0, D) empty
    array; torch inputs are rejected on the parity path.
    """

    @wraps(func)
    def wrapper(self, *args, **kwargs) -> np.ndarray:
        image = args[0]
        try:
            import torch

            if torch.is_tensor(image):
                raise TypeError(
                    "Torch images are not supported on this path. Please convert to NumPy."
                )
        except ImportError:
            pass
        feat_vecs = func(self, *args, **kwargs)
        if feat_vecs is None:
            logger.info("No feature vectors found. Returning empty array.")
            return np.zeros((0, self.output_dim), dtype=np.float32)
        feat_vecs = np.asarray(feat_vecs)
        if feat_vecs.ndim != 2:
            raise ValueError(
                f"Feature extractor output must be 2D. Got shape {feat_vecs.shape}."
            )
        if feat_vecs.shape[1] != self.output_dim:
            raise ValueError(
                f"Expected feat_vecs.shape[1] == {self.output_dim}, "
                f"but got {feat_vecs.shape[1]}."
            )
        return feat_vecs

    return wrapper


def _to_gray_u8(image: np.ndarray) -> np.ndarray:
    """RGB/gray -> uint8 grayscale, matching OpenCV's RGB2GRAY weights."""
    if image.ndim == 3:
        g = image[..., 0] * 0.299 + image[..., 1] * 0.587 + image[..., 2] * 0.114
        return np.round(g).astype(np.uint8)
    return image.astype(np.uint8)


class SIFT(FeatureExtractorBase):
    """Scale-Invariant Feature Transform extractor, 128-D descriptors.

    Equivalent capability to reference _features.py:54-83 (OpenCV
    ``SIFT.detectAndCompute``). ``backend="tpu"`` uses the batched JAX
    pipeline in ops/sift.py with a static per-image keypoint budget;
    ``backend="opencv"`` is the host golden path.

    :param backend: "tpu" or "opencv".
    :param max_keypoints: static keypoint budget N_max for the TPU backend.
    :param process_size: static letterbox resolution of the TPU pipeline.
    """

    def __init__(
        self,
        backend: str = "tpu",
        max_keypoints: int = 2048,
        process_size: int = 512,
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` with a 'data' axis —
        ``extract_batch`` then runs data-parallel across its devices
        (``parallel.sharded_sift_batch``; exact same results)."""
        super().__init__()
        self._output_dim = 128
        if backend not in ("tpu", "opencv"):
            raise ValueError(f"Unknown SIFT backend: {backend!r}")
        self.backend = backend
        self.max_keypoints = max_keypoints
        self.process_size = process_size
        self.mesh = mesh
        self._root = False  # RootSIFT subclass flips this

    @property
    def output_dim(self) -> int:
        return self._output_dim

    @property
    def descriptor_budget(self) -> int | None:
        return self.max_keypoints if self.backend == "tpu" else None

    def _opencv_descriptors(self, image: np.ndarray) -> np.ndarray | None:
        import cv2

        sift = cv2.SIFT.create()
        _, descriptors = sift.detectAndCompute(image.astype(np.uint8), None)
        return descriptors

    @property
    def _sift_cfg(self):
        from ..ops import sift as sift_ops

        return sift_ops.SiftConfig(
            max_keypoints=self.max_keypoints, process_size=self.process_size
        )

    def _tpu_descriptors(self, image: np.ndarray):
        from ..ops import sift as sift_ops

        gray = _to_gray_u8(image).astype(np.float32) / 255.0
        desc, mask = sift_ops.sift_single(
            gray, max_keypoints=self.max_keypoints, root_sift=self._root,
            cfg=self._sift_cfg,
        )
        return desc, mask

    @_check_output_shape
    def __call__(self, image: np.ndarray) -> np.ndarray:
        super().__call__(image)
        if self.backend == "opencv":
            d = self._opencv_descriptors(image)
            if d is not None and self._root:
                d = d / (d.sum(axis=1, keepdims=True) + 1e-7)
                d = np.sqrt(d)
            return d
        desc, mask = self._tpu_descriptors(image)
        desc = np.asarray(desc)
        mask = np.asarray(mask) > 0.5
        return desc[mask]

    def extract_batch(self, images):
        if self.backend != "tpu":
            return super().extract_batch(images)
        from ..ops import sift as sift_ops

        if isinstance(images, np.ndarray) and images.ndim == 3:
            images = [images]
        grays = [_to_gray_u8(np.asarray(img)) for img in images]
        if self.mesh is not None:
            from ..parallel import sharded_sift_batch

            return sharded_sift_batch(
                grays, self.mesh, cfg=self._sift_cfg, root_sift=self._root
            )
        return sift_ops.sift_batch(
            grays, max_keypoints=self.max_keypoints, root_sift=self._root,
            cfg=self._sift_cfg,
        )

    def extract_batch_device(self, images):
        """Device-resident variant of ``extract_batch``: descriptors stay
        on the accelerator (f32, root-SIFT applied on device) so an
        immediately-following on-device encode skips the descriptor
        downlink and the f32 re-upload — the two transfers that dominate
        the SIFT-family ``generate_encoding_map`` flow on relay-attached
        chips (docs/PERF.md round 3f). Falls back to the host path for
        the opencv backend and mesh extraction (the mesh path
        materializes host-side by design — ADVICE r2)."""
        if self.backend != "tpu" or self.mesh is not None:
            return self.extract_batch(images)
        import os

        from ..ops import sift as sift_ops

        if isinstance(images, np.ndarray) and images.ndim == 3:
            images = [images]
        images = list(images) if not isinstance(images, np.ndarray) else images
        cap = 16 * int(os.environ.get("PYVISIM_SIFT_DEVICE_BATCH", "16"))
        if len(images) > cap:
            # gallery-scale request: fall back to the bounded-HBM wire
            # path rather than keeping ~1 MB/img of descriptors resident
            return self.extract_batch(images)
        grays = [_to_gray_u8(np.asarray(img)) for img in images]
        return sift_ops.sift_batch(
            grays, max_keypoints=self.max_keypoints, root_sift=self._root,
            cfg=self._sift_cfg, device=True,
        )

    def __repr__(self):
        return f"{type(self).__name__}(output_dim={self.output_dim}, backend={self.backend!r})"


class RootSIFT(SIFT):
    """SIFT with the Hellinger kernel map: L1-normalize (+1e-7) then sqrt.

    Equivalent capability to reference _features.py:86-118; the map itself
    is fused into the TPU descriptor kernel.
    """

    def __init__(
        self,
        backend: str = "tpu",
        max_keypoints: int = 2048,
        process_size: int = 512,
        mesh=None,
    ):
        super().__init__(
            backend=backend, max_keypoints=max_keypoints,
            process_size=process_size, mesh=mesh,
        )
        self._root = True


class Lambda(FeatureExtractorBase):
    """Wraps any user callable ``image -> (N, output_dim)`` array.

    Equivalent capability to reference _features.py:121-148.
    """

    def __init__(self, func: Callable, output_dim: int):
        super().__init__()
        if not callable(func):
            raise ValueError(
                f"Argument func must be a callable object, got {type(func)} instead"
            )
        self._output_dim = output_dim
        self.func = func

    @property
    def output_dim(self) -> int:
        return self._output_dim

    @_check_output_shape
    def __call__(self, image: np.ndarray) -> np.ndarray:
        super().__call__(image)
        return self.func(image)

    def __repr__(self):
        return f"Lambda(output_dim={self.output_dim})"


class DeepConvFeature(FeatureExtractorBase):
    """Deep convolutional feature extractor over a Flax VGG trunk.

    Equivalent capability to reference _features.py:151-306: flattens the
    chosen conv layer's feature map (post-ReLU — what the reference's hook
    observably captures under torchvision's inplace ReLU; see
    models/vgg.py) to ``(Hf*Wf, C)`` descriptors and optionally appends
    normalized ``(x/Wf, y/Hf)`` coordinates (reference: _features.py:291-298)
    for ``C+2`` dims (514 for VGG16's last conv).

    TPU-first redesign: the resize→forward→flatten→coord-concat chain is a
    single jitted function; ``extract_batch`` runs it once for a whole
    batch. There is no mutable hook buffer — the extractor is reentrant.

    Preprocessing parity note: the reference's default transform is
    ToTensor + Resize(224) with **no** ImageNet normalization (the
    docstring at _features.py:170 claims normalization; the code at
    :192-194 has none — we follow the code).

    :param cfg_name: VGG variant ("vgg11"/"vgg16"/"vgg19"); ignored when a
        custom ``module`` is given.
    :param params: Flax params; None -> deterministic random init (seed 0;
        required for custom modules). Use
        ``models.vgg.params_from_torch_state_dict`` for pretrained
        torchvision checkpoints.
    :param layer_index: conv layer to capture (negative from the end).
    :param spatial_encoding: append (x/Wf, y/Hf) to each descriptor.
    :param image_size: input resolution (default 224).
    :param transform: optional callable ``(B, H, W, 3) uint8/float ->
        (B, image_size, image_size, 3) float in [0, 1]`` replacing the
        default resize.
    :param module: optional custom Flax module whose ``apply(params, x)``
        returns a ``(B, Hf, Wf, C)`` feature map — the TPU-native analog of
        the reference's arbitrary torch model + ``target_submodule`` hook
        (reference _features.py:177-211); requires ``params``.
    :param int8: route the MXU-bound middle VGG convs through the chip's
        int8 path (dynamic symmetric quantization; ~1.26x end-to-end with
        trunk-encoding cosine vs f32 > 0.999 — see models/vgg.py and
        docs/PERF.md). Ignored for custom modules.
    :param mesh: optional ``jax.sharding.Mesh`` with a 'data' axis —
        ``extract_batch`` then shards the image batch across its devices
        (GSPMD; params replicated), identical results to single-device.
    """

    def __init__(
        self,
        cfg_name: str = "vgg16",
        params: Any = None,
        layer_index: int = -1,
        spatial_encoding: bool = True,
        image_size: int = 224,
        transform: Callable | None = None,
        dtype: Any = jnp.float32,
        module: Any = None,
        int8: bool = False,
        mesh=None,
    ):
        super().__init__()
        self.mesh = mesh
        self.cfg_name = cfg_name
        self.layer_index = layer_index
        self.spatial_encoding = spatial_encoding
        self.image_size = image_size
        self.transform = transform
        self.dtype = dtype
        if module is not None:
            if params is None:
                raise ValueError("A custom module requires explicit params.")
            self._model = module
            self.params = params
            # probe the feature-map geometry once with an abstract trace
            out = jax.eval_shape(
                lambda p, x: module.apply(p, x),
                params,
                jax.ShapeDtypeStruct((1, image_size, image_size, 3), dtype),
            )
            if len(out.shape) != 4:
                raise ValueError(
                    f"Custom module must return a (B, Hf, Wf, C) feature map, "
                    f"got shape {out.shape}."
                )
            self._fmap_hw = (out.shape[1], out.shape[2])
            c = out.shape[3]
        else:
            self._model = vgg_lib.VGGConvFeatures(
                cfg_name=cfg_name, layer_index=layer_index, dtype=dtype,
                int8=int8,
            )
            if params is None:
                logger.warning(
                    "DeepConvFeature: no pretrained params given; using "
                    "deterministic random initialization (seed 0). Convert a "
                    "torchvision checkpoint with "
                    "models.vgg.params_from_torch_state_dict for pretrained "
                    "behavior."
                )
                params = vgg_lib.init_params(
                    cfg_name, layer_index, seed=0, image_size=image_size, dtype=dtype
                )
            self.params = params
            n_convs = vgg_lib.num_conv_layers(cfg_name)
            if not -n_convs <= layer_index < n_convs:
                raise IndexError(
                    f"Model {cfg_name} has only {n_convs} convolutional layers. "
                    f"Got layer_index={layer_index}."
                )
            self._fmap_hw = None
            c = vgg_lib.conv_out_channels(cfg_name, layer_index)
        self._output_dim = c + 2 if spatial_encoding else c
        self._jit_forward = jax.jit(self._forward)
        # Split stages for ragged batches: one cached trace per input shape
        # for the resize, one shared trace for the trunk.
        self._jit_preprocess = jax.jit(self.transform or self._preprocess)
        self._jit_preprocess_bucketed = jax.jit(self._preprocess_bucketed)
        self._jit_forward_features = jax.jit(self._forward_features)
        if self.mesh is not None:
            # GSPMD data parallelism: the image batch shards over 'data',
            # params replicate (jit closure), XLA inserts no collectives
            # until a downstream consumer needs them.
            from ..parallel import data_sharding

            self._jit_forward_mesh = jax.jit(
                self._forward, in_shardings=(data_sharding(self.mesh, 4),),
            )
            self._jit_forward_features_mesh = jax.jit(
                self._forward_features,
                in_shardings=(data_sharding(self.mesh, 4),),
            )

    def list_conv_layers(self):
        """(index, name, out_channels) for each conv layer
        (parity with reference _features.py:239-252)."""
        chans = [c for c in vgg_lib.VGG_CFGS[self.cfg_name] if c != "M"]
        return [(i, f"conv{i}", c) for i, c in enumerate(chans)]

    @property
    def model(self):
        """The Flax trunk module (parity: reference _features.py:218-225,
        where ``.model`` is the hooked torch backbone)."""
        return self._model

    @model.setter
    def model(self, value):
        """Swap the backbone after construction. Flax separates parameters
        from module structure, so assign a ``(module, params)`` pair —
        the TPU-native analog of the reference's setter taking one
        stateful torch module. Rewires geometry probes, output_dim, and
        the jit caches exactly like constructing with ``module=``."""
        if not (isinstance(value, tuple) and len(value) == 2):
            raise ValueError(
                "Assign model = (flax_module, params): Flax modules are "
                "stateless, so the swapped backbone travels with its "
                "params (reference parity: _features.py:222-225)."
            )
        module, params = value
        self.__init__(
            cfg_name=self.cfg_name, params=params,
            layer_index=self.layer_index,
            spatial_encoding=self.spatial_encoding,
            image_size=self.image_size, transform=self.transform,
            dtype=self.dtype, module=module, mesh=self.mesh,
        )

    @property
    def output_dim(self) -> int:
        return self._output_dim

    @property
    def descriptor_budget(self) -> int | None:
        # Feature-map locations are fixed by the static input size.
        if self._fmap_hw is not None:
            return self._fmap_hw[0] * self._fmap_hw[1]
        n_pools_before = 0
        cfg = vgg_lib.VGG_CFGS[self.cfg_name]
        target = self.layer_index % vgg_lib.num_conv_layers(self.cfg_name)
        conv_i = 0
        for item in cfg:
            if item == "M":
                n_pools_before += 1
            else:
                if conv_i == target:
                    break
                conv_i += 1
        hf = self.image_size // (2**n_pools_before)
        return hf * hf

    def _resize_masked(
        self, x: jnp.ndarray, oh, ow, padded: bool = False
    ) -> jnp.ndarray:
        """(B, BH, BW, C) float with valid region (oh, ow) -> (B, S, S, C).

        ``jax.image.resize``-equivalent antialiased linear resampling via
        ``scale_and_translate`` with *dynamic* source extent: when the
        input is zero-padded past (oh, ow), dividing by the identically
        resampled ones-mask renormalizes the separable kernel over the
        valid region — numerically identical (float noise) to resizing
        the unpadded image, so one compiled graph serves every original
        shape that shares a padding bucket.

        The resampling itself runs in float32 regardless of ``x.dtype``:
        a bf16-rounded *scale* would shift sample-tap positions by up to
        ~0.6 px (breaking the torchvision-Resize parity), which is a far
        larger error than bf16 pixel storage. The result is cast back."""
        return _masked_linear_resize(x, self.image_size, oh, ow, padded=padded)

    def _preprocess(self, images: jnp.ndarray) -> jnp.ndarray:
        """uint8/float HWC batch -> (B, S, S, 3) float in [0, 1], bilinear
        resize with antialiasing (torchvision Resize-on-tensor parity)."""
        x = images.astype(self.dtype) / 255.0
        if x.shape[1] != self.image_size or x.shape[2] != self.image_size:
            x = self._resize_masked(x, x.shape[1], x.shape[2])
        return x

    def _preprocess_bucketed(self, x: jnp.ndarray, oh, ow) -> jnp.ndarray:
        """Zero-padded raw (B, BH, BW, 3) + dynamic original dims ->
        (B, S, S, 3); compiled once per padding bucket."""
        return self._resize_masked(
            x.astype(self.dtype) / 255.0, oh, ow, padded=True
        )

    def _prep_ragged(self, img: np.ndarray) -> jnp.ndarray:
        """One raw image of ANY shape -> (1, S, S, 3), bounding distinct
        jit traces to the padding-bucket ladder instead of one ~20-40 s
        remote compile per distinct photo shape (mixed-size corpora)."""
        h, w = img.shape[:2]
        bh, bw = _bucket_side(h), _bucket_side(w)
        if (bh, bw) == (h, w):
            return self._jit_preprocess(jnp.asarray(img)[None])
        padded = np.zeros((bh, bw) + img.shape[2:], img.dtype)
        padded[:h, :w] = img
        return self._jit_preprocess_bucketed(
            jnp.asarray(padded)[None], jnp.float32(h), jnp.float32(w)
        )

    def _forward(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) raw -> (B, Hf*Wf, D) descriptors."""
        x = self.transform(images) if self.transform else self._preprocess(images)
        return self._forward_features(x)

    def _forward_features(self, x: jnp.ndarray) -> jnp.ndarray:
        """Preprocessed (B, S, S, 3) float in [0, 1] -> (B, Hf*Wf, D)."""
        fmap = self._model.apply(self.params, x)  # (B, Hf, Wf, C)
        b, hf, wf, c = fmap.shape
        desc = fmap.reshape(b, hf * wf, c)
        if self.spatial_encoding:
            ys = (jnp.arange(hf, dtype=self.dtype) / hf)[:, None]
            xs = (jnp.arange(wf, dtype=self.dtype) / wf)[None, :]
            coords = jnp.stack(
                [jnp.broadcast_to(xs, (hf, wf)), jnp.broadcast_to(ys, (hf, wf))],
                axis=-1,
            ).reshape(1, hf * wf, 2)
            desc = jnp.concatenate(
                [desc, jnp.broadcast_to(coords, (b, hf * wf, 2))], axis=-1
            )
        return desc

    @_check_output_shape
    def __call__(self, image: np.ndarray) -> np.ndarray:
        super().__call__(image)
        if self.transform is not None:
            desc = self._jit_forward(jnp.asarray(image)[None])
        else:
            # bucketed resize first: a per-shape trace here is just the
            # resize graph, not a fresh compile of the whole trunk
            desc = self._jit_forward_features(
                self._prep_ragged(np.asarray(image))
            )
        return np.asarray(desc[0])

    def extract_batch(self, images):
        import os

        if isinstance(images, np.ndarray) and images.ndim == 3:
            images = [images]
        if not isinstance(images, np.ndarray):
            images = list(images)  # materialize iterators/generators
        # Device-batch cap: VGG's first block costs ~13 MB of activations
        # per 224² image, so an unbounded caller batch would exhaust HBM.
        # 128/call is also the measured throughput sweet spot (PERF.md).
        # Multi-chunk results accumulate host-side — the descriptors of an
        # unbounded gallery must not pin HBM either.
        cap = int(os.environ.get("PYVISIM_DEEP_DEVICE_BATCH", "128"))
        n = len(images)
        if n > cap:
            parts = [
                self.extract_batch(images[i : i + cap])
                for i in range(0, n, cap)
            ]
            return (
                np.concatenate([np.asarray(p[0]) for p in parts], axis=0),
                np.concatenate([np.asarray(p[1]) for p in parts], axis=0),
            )
        if isinstance(images, np.ndarray) and images.ndim == 4:
            batch = jnp.asarray(images)
        else:
            images = list(images)
            shapes = {np.asarray(i).shape for i in images}
            if len(shapes) == 1:
                batch = jnp.asarray(np.stack([np.asarray(i) for i in images]))
            else:
                # Ragged sizes: preprocess per image with the SAME on-device
                # antialiased-linear path as `_preprocess` (bucket-padded, so
                # traces are bounded by the size ladder), so an image
                # produces identical descriptors regardless of the batch it
                # arrives in.
                if self.transform is not None:
                    pre = [
                        self._jit_preprocess(jnp.asarray(np.asarray(i))[None])
                        for i in images
                    ]
                else:
                    pre = [self._prep_ragged(np.asarray(i)) for i in images]
                desc = self._run_forward(
                    jnp.concatenate(pre, axis=0), preprocessed=True
                )
                mask = jnp.ones(desc.shape[:2], self.dtype)
                return desc, mask
        desc = self._run_forward(batch, preprocessed=False)
        mask = jnp.ones(desc.shape[:2], self.dtype)
        return desc, mask

    def _run_forward(self, batch: jnp.ndarray, preprocessed: bool):
        """Dispatch a uniform batch to the single-device or mesh-sharded
        forward (batch padded to the 'data' axis extent and sliced back)."""
        if self.mesh is None:
            fn = (
                self._jit_forward_features if preprocessed
                else self._jit_forward
            )
            return fn(batch)
        from ..parallel import pad_to_multiple

        padded, b0 = pad_to_multiple(batch, self.mesh.shape["data"])
        fn = (
            self._jit_forward_features_mesh if preprocessed
            else self._jit_forward_mesh
        )
        return fn(padded)[:b0]

    def __repr__(self):
        return (
            f"DeepConvFeature(cfg={self.cfg_name}, layer_index={self.layer_index}, "
            f"spatial_encoding={self.spatial_encoding}, output_dim={self.output_dim})"
        )
