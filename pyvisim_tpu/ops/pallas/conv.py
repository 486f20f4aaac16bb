"""Fused 3x3-conv + ReLU + 2x2-maxpool Pallas kernel (VGG block boundary).

Round-1 profiling (docs/PERF.md) located the remaining VGG16 throughput
headroom in the early high-resolution layers: XLA runs conv1 (224², 64→64)
+ pool as separate HBM round trips at ~57 TFLOP/s effective. This kernel
fuses conv+bias+ReLU+pool for one image row-tile at a time:

- the conv is a single MXU matmul per sub-tile in im2col form,
  ``(rows*W, 9*C_in) @ (9*C_in, C_out)`` — contraction depth 576 for C=64,
  deep enough to keep the systolic array busy (vs 64 for the naive
  9-matmul form);
- the halo rows come in through two extra 1-row BlockSpecs on the same
  input array, so Pallas' standard block pipeline handles all DMA and
  double-buffering (no manual copies);
- the conv output and the pooled result never touch HBM: ReLU + 2x2 max
  happen on the f32 accumulator in VMEM and only the pooled (H/2, W/2,
  C_out) block is written back — 4x less HBM write traffic than conv
  alone, and the pre-pool activation (6.4 MB/image at 224²) is never
  materialized.

Equivalent capability: torchvision's ``features[2] (Conv2d) -> ReLU ->
MaxPool2d`` prefix that the reference forwards every image through
(reference: pyvisim/features/_features.py:276-285). The XLA reference
implementation below is the correctness oracle (tests/test_pallas_conv.py).

STATUS — measured, not wired into the VGG trunk: on v5e (round 2,
dispatch-corrected timing) XLA's native conv1+ReLU+pool runs at ~42-59
us/img, already ~93 TFLOP/s effective against the ~98 TFLOP/s bound its
N=64 output width imposes on the 128-wide MXU. This kernel measures
~157 us/img: the im2col relayout stores (57 MB/image of shifted VMEM
copies) dominate, and the same VPU-traffic wall applies to every
restructuring we measured (9-tap accumulated dots, dx-only im2col, and
an XLA space-to-depth 2x2/K=1024/N=256 repack — 71+84 us/img). The
fused kernel is kept as a correct, tested building block and as the
recorded result of that exploration (docs/PERF.md "round 2" section);
the production trunk keeps XLA's conv.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "conv3x3_relu_maxpool",
    "conv3x3_relu_maxpool_reference",
    "conv3x3_relu_maxpool_q8",
]


def conv3x3_relu_maxpool_reference(x, w, b):
    """XLA oracle: SAME 3x3 conv + bias + ReLU + 2x2 max pool.

    x: (B, H, W, C_in), w: (3, 3, C_in, C_out) HWIO, b: (C_out,).
    Returns (B, H//2, W//2, C_out) in x.dtype (f32 accumulation).
    """
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = jnp.maximum(y + b.astype(jnp.float32), 0.0)
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    return y.astype(x.dtype)


def _fused_kernel(x_ref, top_ref, bot_ref, w_ref, b_ref, out_ref, xpad_ref,
                  patches_ref, *, tile_h, width, sub_h):
    """One (image, row-tile) grid step.

    x_ref:   (1, tile_h, W, C)  conv-input rows of this tile
    top_ref: (1, 1, W, C)       row above the tile (clamped; masked at r=0)
    bot_ref: (1, 1, W, C)       row below the tile (clamped; masked at end)
    w_ref:   (9*C, C_out)       im2col weights
    b_ref:   (1, C_out)
    out_ref: (1, tile_h//2, W//2, C_out) pooled output rows
    xpad_ref: VMEM scratch (tile_h + 2, W + 2, C)
    """
    r = pl.program_id(1)
    n_r = pl.num_programs(1)
    c_in = x_ref.shape[-1]
    dtype = x_ref.dtype

    # Assemble the zero-padded tile: interior + halo rows + zero columns.
    xpad_ref[1 : tile_h + 1, 1 : width + 1, :] = x_ref[0]
    zero_row = jnp.zeros((1, width, c_in), dtype)
    xpad_ref[0:1, 1 : width + 1, :] = jnp.where(r == 0, zero_row, top_ref[0])
    xpad_ref[tile_h + 1 : tile_h + 2, 1 : width + 1, :] = jnp.where(
        r == n_r - 1, zero_row, bot_ref[0]
    )
    xpad_ref[:, 0:1, :] = jnp.zeros((tile_h + 2, 1, c_in), dtype)
    xpad_ref[:, width + 1 : width + 2, :] = jnp.zeros((tile_h + 2, 1, c_in), dtype)

    bias = b_ref[0].astype(jnp.float32)

    # Sub-tiles bound the (sub_h*W, 9C) im2col scratch to VMEM scale.
    # The shifted slices carry misaligned vector layouts; storing each into
    # its lane-range of the patches scratch forces canonical layout (Mosaic
    # cannot concatenate offset-mismatched vectors directly).
    for h in range(tile_h // sub_h):
        row0 = h * sub_h
        for p, (dy, dx) in enumerate(
            (dy, dx) for dy in range(3) for dx in range(3)
        ):
            patches_ref[:, :, p * c_in : (p + 1) * c_in] = xpad_ref[
                row0 + dy : row0 + dy + sub_h, dx : dx + width, :
            ]
        patches = patches_ref[:].reshape(sub_h * width, 9 * c_in)
        y = (
            jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
            + bias
        )
        y = jnp.maximum(y, 0.0).reshape(sub_h, width, -1)
        pooled = jnp.max(
            y.reshape(sub_h // 2, 2, width // 2, 2, y.shape[-1]), axis=(1, 3)
        )
        out_ref[0, row0 // 2 : row0 // 2 + sub_h // 2] = pooled.astype(
            out_ref.dtype
        )


def _pick_tile(h: int) -> tuple[int, int]:
    """(tile_h, sub_h): row-tile height and matmul sub-tile height."""
    for tile in (32, 16, 8, 4, 2):
        if h % tile == 0:
            return tile, min(tile, 16)
    raise ValueError(f"height {h} must be even for 2x2 pooling")


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_relu_maxpool(x, w, b, *, interpret: bool = False):
    """Fused SAME 3x3 conv + bias + ReLU + 2x2 max pool on TPU.

    x: (B, H, W, C_in) with H, W even; w: (3, 3, C_in, C_out); b: (C_out,).
    Returns (B, H//2, W//2, C_out) in x.dtype. Accumulation is float32.
    """
    batch, height, width, c_in = x.shape
    c_out = w.shape[-1]
    tile_h, sub_h = _pick_tile(height)
    n_tiles = height // tile_h

    w_mat = w.astype(x.dtype).reshape(9 * c_in, c_out)
    b_mat = b.reshape(1, c_out)

    grid = (batch, n_tiles)
    kernel = functools.partial(
        _fused_kernel, tile_h=tile_h, width=width, sub_h=sub_h
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, width, c_in),
                lambda bi, r: (bi, r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # 1-row halo blocks: block units are single rows, so the index
            # map addresses raw row indices (clamped at the image edges;
            # the kernel masks the clamped rows to zero).
            pl.BlockSpec(
                (1, 1, width, c_in),
                lambda bi, r: (bi, jnp.maximum(r * tile_h - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, width, c_in),
                lambda bi, r: (
                    bi,
                    jnp.minimum(r * tile_h + tile_h, height - 1),
                    0,
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (9 * c_in, c_out), lambda bi, r: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, c_out), lambda bi, r: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h // 2, width // 2, c_out),
            lambda bi, r: (bi, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, height // 2, width // 2, c_out), x.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, width + 2, c_in), x.dtype),
            pltpu.VMEM((sub_h, width, 9 * c_in), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * height * width * 9 * c_in * c_out,
            bytes_accessed=x.size * x.dtype.itemsize
            + batch * (height // 2) * (width // 2) * c_out * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, x, w_mat, b_mat)


def _fused_kernel_q8(
    x_ref, top_ref, bot_ref, w_ref, b_ref, sw_ref, sx_ref, out_ref,
    xpad_ref, xq_ref, patches_ref, *, tile_h, width, sub_h,
):
    """int8 variant of ``_fused_kernel``: the activation tile is quantized
    IN VMEM (per-image symmetric scale, scalar-prefetched), the im2col
    scratch stores move int8 (half the byte traffic that dominates the
    bf16 kernel), and the matmul runs on the int8 MXU path with int32
    accumulation, dequantized per output channel before bias/ReLU/pool.

    Extra refs vs the bf16 kernel: w_ref is int8 ``(9C, C_out)``; sw_ref
    ``(1, C_out)`` per-channel weight scales; sx_ref ``(1, 1)`` this
    image's activation scale.
    """
    r = pl.program_id(1)
    n_r = pl.num_programs(1)
    c_in = x_ref.shape[-1]
    dtype = x_ref.dtype

    xpad_ref[1 : tile_h + 1, 1 : width + 1, :] = x_ref[0]
    zero_row = jnp.zeros((1, width, c_in), dtype)
    xpad_ref[0:1, 1 : width + 1, :] = jnp.where(r == 0, zero_row, top_ref[0])
    xpad_ref[tile_h + 1 : tile_h + 2, 1 : width + 1, :] = jnp.where(
        r == n_r - 1, zero_row, bot_ref[0]
    )
    xpad_ref[:, 0:1, :] = jnp.zeros((tile_h + 2, 1, c_in), dtype)
    xpad_ref[:, width + 1 : width + 2, :] = jnp.zeros((tile_h + 2, 1, c_in), dtype)

    # one VPU pass: quantize the padded tile to int8 in VMEM
    inv = 1.0 / sx_ref[0, 0, 0]
    xq_ref[:] = (
        jnp.clip(jnp.round(xpad_ref[:].astype(jnp.float32) * inv), -127, 127)
        .astype(jnp.int8)
    )

    bias = b_ref[0].astype(jnp.float32)
    deq = sx_ref[0, 0, 0] * sw_ref[0].astype(jnp.float32)  # (C_out,)

    for h in range(tile_h // sub_h):
        row0 = h * sub_h
        for p, (dy, dx) in enumerate(
            (dy, dx) for dy in range(3) for dx in range(3)
        ):
            patches_ref[:, :, p * c_in : (p + 1) * c_in] = xq_ref[
                row0 + dy : row0 + dy + sub_h, dx : dx + width, :
            ]
        patches = patches_ref[:].reshape(sub_h * width, 9 * c_in)
        acc = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * deq + bias
        y = jnp.maximum(y, 0.0).reshape(sub_h, width, -1)
        pooled = jnp.max(
            y.reshape(sub_h // 2, 2, width // 2, 2, y.shape[-1]), axis=(1, 3)
        )
        out_ref[0, row0 // 2 : row0 // 2 + sub_h // 2] = pooled.astype(
            out_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_relu_maxpool_q8(x, w, b, *, interpret: bool = False):
    """Fused quantize + int8 SAME 3x3 conv + bias + ReLU + 2x2 max pool.

    Dynamic symmetric quantization with per-IMAGE activation scales and
    per-output-channel weight scales (the models/quant.QuantConv recipe,
    fused so the int8 activation tensor never round-trips HBM). The
    ROADMAP #4 / VERDICT r2 #7 experiment — measured numbers in
    docs/PERF.md round-3 section.
    """
    batch, height, width, c_in = x.shape
    c_out = w.shape[-1]
    tile_h, sub_h = _pick_tile(height)
    n_tiles = height // tile_h

    sx = jnp.maximum(
        jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(1, 2, 3), keepdims=False)
        / 127.0,
        1e-8,
    ).reshape(batch, 1, 1)  # per-image activation scales
    w_mat = w.astype(jnp.float32).reshape(9 * c_in, c_out)
    sw = jnp.maximum(jnp.max(jnp.abs(w_mat), axis=0) / 127.0, 1e-8)
    wq = jnp.clip(jnp.round(w_mat / sw), -127, 127).astype(jnp.int8)
    b_mat = b.reshape(1, c_out)
    sw_mat = sw.reshape(1, c_out)

    grid = (batch, n_tiles)
    kernel = functools.partial(
        _fused_kernel_q8, tile_h=tile_h, width=width, sub_h=sub_h
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, width, c_in),
                lambda bi, r: (bi, r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, width, c_in),
                lambda bi, r: (bi, jnp.maximum(r * tile_h - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, width, c_in),
                lambda bi, r: (
                    bi,
                    jnp.minimum(r * tile_h + tile_h, height - 1),
                    0,
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (9 * c_in, c_out), lambda bi, r: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, c_out), lambda bi, r: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, c_out), lambda bi, r: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, 1), lambda bi, r: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h // 2, width // 2, c_out),
            lambda bi, r: (bi, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, height // 2, width // 2, c_out), x.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, width + 2, c_in), x.dtype),
            pltpu.VMEM((tile_h + 2, width + 2, c_in), jnp.int8),
            pltpu.VMEM((sub_h, width, 9 * c_in), jnp.int8),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * height * width * 9 * c_in * c_out,
            bytes_accessed=x.size * x.dtype.itemsize
            + batch * (height // 2) * (width // 2) * c_out * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, x, wq, b_mat, sw_mat, sx)
