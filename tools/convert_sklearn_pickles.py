"""Convert the reference's joblib-pickled sklearn vocabularies to .npz
codebooks.

The reference ships sklearn estimators pickled with joblib
(reference: pyvisim/res/model_files/*.pkl, loaded at
pyvisim/encoders/_base_encoder.py:117-121). pyvisim_tpu uses plain-array
``.npz`` codebooks (safe to load, jit-friendly). This tool extracts the
arrays from any pickles it can find and writes the converted artifacts
into pyvisim_tpu/res/model_files/.

Usage: python tools/convert_sklearn_pickles.py [source_dir]
"""
from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import joblib  # noqa: E402

from pyvisim_tpu._config import MODEL_FILES_PATH  # noqa: E402
from pyvisim_tpu.ops.codebooks import (  # noqa: E402
    GmmCodebook,
    KMeansCodebook,
    PcaProjector,
    save_codebook,
)

DEFAULT_SOURCE = "/root/reference/pyvisim/res/model_files"


def convert_one(pkl_path: pathlib.Path, out_dir: pathlib.Path) -> str:
    obj = joblib.load(pkl_path)
    if hasattr(obj, "cluster_centers_"):
        codebook = KMeansCodebook.from_sklearn(obj)
    elif hasattr(obj, "covariances_"):
        codebook = GmmCodebook.from_sklearn(obj)
    elif hasattr(obj, "components_"):
        codebook = PcaProjector.from_sklearn(obj)
    else:
        raise TypeError(f"Unrecognized estimator in {pkl_path}: {type(obj)}")
    out = out_dir / (pkl_path.stem + ".npz")
    save_codebook(out, codebook)
    return out.name


def main() -> None:
    src = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SOURCE)
    MODEL_FILES_PATH.mkdir(parents=True, exist_ok=True)
    pickles = sorted(src.glob("*.pkl"))
    if not pickles:
        print(f"No pickles found under {src}")
        return
    for p in pickles:
        try:
            name = convert_one(p, MODEL_FILES_PATH)
            print(f"converted {p.name} -> {name}")
        except Exception as e:  # noqa: BLE001
            print(f"FAILED {p.name}: {e}")


if __name__ == "__main__":
    main()
