"""Fused conv3x3+ReLU+maxpool Pallas kernel vs its XLA oracle.

Interpret mode on CPU (the compiled path was validated on the chip;
docs/PERF.md round-2 section records the on-TPU measurements).
"""
import numpy as np
import pytest

import jax
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


def test_fused_q8_conv_matches_quantized_oracle(rng):
    """The fused quantize+int8 kernel must match an XLA oracle that applies
    the identical QuantConv quantization recipe (per-image activation
    scale, per-channel weight scales, int32 accumulation)."""
    from pyvisim_tpu.ops.pallas.conv import conv3x3_relu_maxpool_q8

    b, h, w_, ci, co = 2, 16, 32, 64, 64
    x = jnp.asarray(rng.normal(size=(b, h, w_, ci)).astype(np.float32))
    wk = jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))

    # oracle: same quantization recipe through XLA's conv
    sx = np.maximum(
        np.abs(np.asarray(x)).max(axis=(1, 2, 3)) / 127.0, 1e-8
    )  # (B,)
    w_mat = np.asarray(wk, np.float32)
    sw = np.maximum(np.abs(w_mat.reshape(-1, co)).max(axis=0) / 127.0, 1e-8)
    xq = np.clip(
        np.round(np.asarray(x) / sx[:, None, None, None]), -127, 127
    ).astype(np.int8)
    wq = np.clip(np.round(w_mat / sw), -127, 127).astype(np.int8)
    acc = jax.lax.conv_general_dilated(
        jnp.asarray(xq), jnp.asarray(wq), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = np.asarray(acc, np.float32) * sx[:, None, None, None] * sw + np.asarray(
        bias
    )
    y = np.maximum(y, 0.0)
    want = np.asarray(
        jax.lax.reduce_window(
            jnp.asarray(y), -jnp.inf, jax.lax.max, (1, 2, 2, 1),
            (1, 2, 2, 1), "VALID",
        )
    )

    got = np.asarray(conv3x3_relu_maxpool_q8(x, wk, bias, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
