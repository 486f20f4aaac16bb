"""Gate: every public reference symbol exists on the pyvisim_tpu surface.

tools/parity_audit.py statically parses /root/reference/pyvisim (AST only,
no reference import) and checks module-level functions/classes, public
methods, and enum members against our importable modules — the SURVEY.md
§2 inventory at symbol granularity, enforced in CI.
"""
import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))


@pytest.mark.skipif(
    not pathlib.Path("/root/reference/pyvisim").is_dir(),
    reason="reference mount unavailable",
)
def test_reference_public_api_fully_mirrored(capsys):
    from parity_audit import audit

    rc = audit()
    out = capsys.readouterr().out
    assert rc == 0, f"parity audit found missing symbols:\n{out}"


def test_deep_conv_feature_model_property_swaps_backbone(rng=None):
    """The reference's settable ``.model`` (its _features.py:218-225)
    maps to a (flax_module, params) assignment here."""
    import numpy as np

    from pyvisim_tpu.features import DeepConvFeature
    from pyvisim_tpu.models import vgg as vgg_lib

    ext = DeepConvFeature(cfg_name="vgg11", image_size=64)
    assert ext.model is not None
    with pytest.raises(ValueError, match="module, params"):
        ext.model = ext.model  # bare module: params must travel along

    module = vgg_lib.VGGConvFeatures(cfg_name="vgg11", layer_index=-1)
    params = vgg_lib.init_params("vgg11", -1, seed=1, image_size=64)
    ext.model = (module, params)
    assert ext.model is module
    img = np.random.default_rng(0).integers(
        0, 255, size=(64, 64, 3), dtype=np.uint8
    )
    desc = ext(img)
    assert desc.ndim == 2 and desc.shape[1] == ext.output_dim
