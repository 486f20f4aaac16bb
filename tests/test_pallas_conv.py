"""Fused conv3x3+ReLU+maxpool Pallas kernel vs its XLA oracle.

Interpret mode on CPU (the compiled path was validated on the chip;
docs/PERF.md round-2 section records the on-TPU measurements).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from pyvisim_tpu.ops.pallas.conv import (
    conv3x3_relu_maxpool,
    conv3x3_relu_maxpool_reference,
)


@pytest.mark.parametrize(
    "shape",
    [
        (2, 32, 32, 64, 64),    # single row tile
        (1, 16, 48, 64, 128),   # non-square, wider C_out
        (2, 64, 32, 64, 64),    # multiple row tiles (halo path at r>0)
    ],
)
def test_fused_conv_matches_xla_oracle(shape, rng):
    b, h, w, ci, co = shape
    x = jnp.asarray(rng.normal(size=(b, h, w, ci)).astype(np.float32))
    wk = jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    want = np.asarray(conv3x3_relu_maxpool_reference(x, wk, bias))
    got = np.asarray(conv3x3_relu_maxpool(x, wk, bias, interpret=True))
    assert got.shape == (b, h // 2, w // 2, co)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_fused_conv_zero_padding_semantics(rng):
    """Border outputs must use zero padding, not edge replication: an
    all-ones image with identity-ish weights exposes the border sums."""
    ci = co = 64
    x = jnp.ones((1, 8, 8, ci), jnp.float32)
    # kernel summing all 9 taps of channel 0 into channel 0
    wk = np.zeros((3, 3, ci, co), np.float32)
    wk[:, :, 0, 0] = 1.0
    bias = np.zeros((co,), np.float32)
    got = np.asarray(
        conv3x3_relu_maxpool(x, jnp.asarray(wk), jnp.asarray(bias), interpret=True)
    )
    want = np.asarray(
        conv3x3_relu_maxpool_reference(x, jnp.asarray(wk), jnp.asarray(bias))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
    # corner pre-pool values are 4 (2x2 valid taps); interior 9 -> pooled
    # corner max is 6 (the (1,1) output sees a 2x3/3x2/3x3 mix)
    assert got[0, 0, 0, 0] == want[0, 0, 0, 0]
