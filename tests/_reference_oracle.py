"""Load the reference ``pyvisim`` package as a *live* differential oracle.

Parity gates elsewhere in the suite compare against re-derived formulas or
hand transcriptions of the reference loops; this module lets tests run the
actual reference implementation (``/root/reference/pyvisim``) side by side
with ``pyvisim_tpu`` (VERDICT r3 task 1).

Two environment quirks are handled here:

* ``torchvision`` is not installed in this image. The reference imports it
  at module level (features/_features.py:15-16, _utils.py:18,
  datasets/datasets.py:12) and evaluates ``vgg16(weights=...)`` as a
  *default argument* at class-definition time, so a minimal stub module is
  installed into ``sys.modules`` before the import: ``transforms`` with
  ``Compose/ToTensor/Resize``, ``transforms.functional.gaussian_blur``,
  and ``models.vgg16`` returning a randomly-initialised ``nn.Module`` with
  a VGG16-shaped ``features`` Sequential.
* The reference's ``_config.py`` creates ``res/logs`` and points a file
  log handler inside its own tree at import time. ``/root/reference`` is
  a read-only mount by contract, so the package is copied (~6 MB) to a
  tmp directory and imported from there; all its relative resource paths
  (model pickles, logging YAML) resolve inside the copy.

Nothing from the copy is ever imported into ``pyvisim_tpu`` itself — the
reference runs only inside tests, as ground truth.
"""
from __future__ import annotations

import pathlib
import shutil
import sys
import tempfile
import types

import numpy as np

_REFERENCE_ROOT = pathlib.Path("/root/reference")
_cached = None


def reference_available() -> bool:
    return (_REFERENCE_ROOT / "pyvisim" / "__init__.py").is_file()


def _install_torchvision_stub() -> None:
    if "torchvision" in sys.modules:
        return
    import torch

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")
    models = types.ModuleType("torchvision.models")

    class Compose:
        def __init__(self, transforms_list):
            self.transforms = list(transforms_list)

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
            if t.dtype == torch.uint8:
                t = t.float().div(255.0)
            return t

    class Resize:
        def __init__(self, size, **_kwargs):
            self.size = (size, size) if isinstance(size, int) else tuple(size)

        def __call__(self, t):
            return torch.nn.functional.interpolate(
                t[None].float(), size=self.size, mode="bilinear",
                align_corners=False, antialias=True,
            )[0]

    def gaussian_blur(img, kernel_size, sigma=None):  # pragma: no cover
        raise NotImplementedError(
            "torchvision stub: gaussian_blur is not implemented; the "
            "reference's gaussian_blur helper cannot be oracle-tested here."
        )

    transforms.Compose = Compose
    transforms.ToTensor = ToTensor
    transforms.Resize = Resize
    transforms.functional = functional
    functional.gaussian_blur = gaussian_blur

    class VGG16_Weights:  # noqa: N801 - mirrors the torchvision name
        DEFAULT = "stub"
        IMAGENET1K_V1 = "stub"

    def vgg16(weights=None, **_kwargs):
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, in_ch = [], 3
        for v in cfg:
            if v == "M":
                layers.append(torch.nn.MaxPool2d(2, 2))
            else:
                layers.append(torch.nn.Conv2d(in_ch, v, 3, padding=1))
                layers.append(torch.nn.ReLU(inplace=True))
                in_ch = v
        module = torch.nn.Module()
        module.features = torch.nn.Sequential(*layers)
        return module

    models.vgg16 = vgg16
    models.VGG16_Weights = VGG16_Weights

    tv.transforms = transforms
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional
    sys.modules["torchvision.models"] = models


def load_reference():
    """Import and return the reference ``pyvisim`` package (cached)."""
    global _cached
    if _cached is not None:
        return _cached
    if not reference_available():
        raise RuntimeError("reference package not mounted at /root/reference")

    _install_torchvision_stub()

    staging = pathlib.Path(tempfile.gettempdir()) / "pyvisim_reference_oracle"
    pkg_dir = staging / "pyvisim"
    if not (pkg_dir / "__init__.py").is_file():
        staging.mkdir(exist_ok=True)
        shutil.copytree(_REFERENCE_ROOT / "pyvisim", pkg_dir, dirs_exist_ok=True)

    if str(staging) not in sys.path:
        sys.path.insert(0, str(staging))

    import pyvisim  # noqa: F401
    import pyvisim.encoders  # noqa: F401
    import pyvisim.eval  # noqa: F401
    import pyvisim.features  # noqa: F401
    import pyvisim._utils  # noqa: F401

    _cached = pyvisim
    return pyvisim
