"""Convert the reference's joblib-pickled sklearn vocabularies to .npz
codebooks.

The reference ships sklearn estimators pickled with joblib
(reference: pyvisim/res/model_files/*.pkl, loaded at
pyvisim/encoders/_base_encoder.py:117-121). pyvisim_tpu uses plain-array
``.npz`` codebooks (safe to load, jit-friendly). This tool extracts the
arrays from any pickles it can find and writes the converted artifacts
into pyvisim_tpu/res/model_files/.

The load is skew-hardened: a pickle written by a different sklearn
version aborts the conversion unless ``--allow-version-skew`` is passed,
and every converted codebook is invariant-checked
(ops.codebooks.validate_codebook) before it is written — a layout change
in a future sklearn cannot silently corrupt the artifacts.

Usage: python tools/convert_sklearn_pickles.py [source_dir] [--allow-version-skew]
"""
from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax  # noqa: E402

# Host-side conversion tool: keep the arrays off the TPU relay (the
# sitecustomize forces platform 'axon'; override before first backend use).
jax.config.update("jax_platforms", "cpu")

from pyvisim_tpu._config import MODEL_FILES_PATH  # noqa: E402
from pyvisim_tpu._utils import load_sklearn_pickle  # noqa: E402
from pyvisim_tpu.ops.codebooks import (  # noqa: E402
    GmmCodebook,
    KMeansCodebook,
    PcaProjector,
    save_codebook,
    validate_codebook,
)

DEFAULT_SOURCE = "/root/reference/pyvisim/res/model_files"


def convert_one(
    pkl_path: pathlib.Path,
    out_dir: pathlib.Path,
    *,
    allow_version_skew: bool = False,
) -> str:
    obj = load_sklearn_pickle(pkl_path, allow_version_skew=allow_version_skew)
    if hasattr(obj, "cluster_centers_"):
        codebook = KMeansCodebook.from_sklearn(obj)
    elif hasattr(obj, "covariances_"):
        codebook = GmmCodebook.from_sklearn(obj)
    elif hasattr(obj, "components_"):
        codebook = PcaProjector.from_sklearn(obj)
    else:
        raise TypeError(f"Unrecognized estimator in {pkl_path}: {type(obj)}")
    validate_codebook(codebook)
    out = out_dir / (pkl_path.stem + ".npz")
    save_codebook(out, codebook)
    return out.name


def main() -> None:
    args = sys.argv[1:]
    allow_skew = "--allow-version-skew" in args
    args = [a for a in args if a != "--allow-version-skew"]
    src = pathlib.Path(args[0] if args else DEFAULT_SOURCE)
    MODEL_FILES_PATH.mkdir(parents=True, exist_ok=True)
    pickles = sorted(src.glob("*.pkl"))
    if not pickles:
        print(f"No pickles found under {src}")
        return
    failed = False
    for p in pickles:
        try:
            name = convert_one(p, MODEL_FILES_PATH, allow_version_skew=allow_skew)
            print(f"converted {p.name} -> {name}")
        except Exception as e:  # noqa: BLE001
            failed = True
            print(f"FAILED {p.name}: {e}")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
