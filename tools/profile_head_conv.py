"""Dispatch-corrected head-conv shootout on the chip (ROADMAP #4).

Times four implementations of VGG16's conv2 boundary (224², 64 -> 64,
conv+bias+ReLU+2x2pool), the biggest cost of the bandwidth-bound head:

  xla-bf16     XLA conv (the production trunk path)
  xla-q8       models/quant.QuantConv recipe (separate quantize pass)
  pallas-bf16  ops/pallas/conv.conv3x3_relu_maxpool
  pallas-q8    ops/pallas/conv.conv3x3_relu_maxpool_q8 (fused quantize)

Each candidate runs `iters` evaluations inside ONE jitted fori_loop
(dispatch-corrected; a scalar checksum fetch synchronizes — CLAUDE.md).

Usage: python tools/profile_head_conv.py [--batch 16] [--iters 50]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--cin", type=int, default=64)
    ap.add_argument("--cout", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pyvisim_tpu.ops.pallas.conv import (
        conv3x3_relu_maxpool,
        conv3x3_relu_maxpool_q8,
        conv3x3_relu_maxpool_reference,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(args.batch, args.size, args.size, args.cin))
        .astype(np.float32),
        jnp.bfloat16,
    )
    w = jnp.asarray(
        rng.normal(size=(3, 3, args.cin, args.cout)).astype(np.float32) * 0.05
    )
    b = jnp.asarray(rng.normal(size=(args.cout,)).astype(np.float32))

    def xla_q8(xx, ww, bb):
        xf = xx.astype(jnp.float32)
        sx = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True) / 127.0, 1e-8
        )
        xq = jnp.round(xf / sx).clip(-127, 127).astype(jnp.int8)
        sw = jnp.maximum(jnp.max(jnp.abs(ww), axis=(0, 1, 2)) / 127.0, 1e-8)
        wq = jnp.round(ww / sw).clip(-127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq, wq, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = jnp.maximum(acc.astype(jnp.float32) * (sx * sw) + bb, 0.0)
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ).astype(xx.dtype)

    candidates = {
        "xla-bf16": lambda xx: conv3x3_relu_maxpool_reference(xx, w, b),
        "xla-q8": lambda xx: xla_q8(xx, w, b),
        "pallas-bf16": lambda xx: conv3x3_relu_maxpool(xx, w, b),
        "pallas-q8": lambda xx: conv3x3_relu_maxpool_q8(xx, w, b),
    }

    for name, fn in candidates.items():
        try:
            @jax.jit
            def loop(xx, n, fn=fn):
                def body(i, acc):
                    dep = (jnp.isnan(acc)).astype(xx.dtype)
                    return acc + jnp.sum(fn(xx + dep).astype(jnp.float32))
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            _ = float(loop(x, 2))  # compile + sanity
            t0 = time.time()
            chk = float(loop(x, args.iters))
            dt = time.time() - t0
            us_img = dt / (args.iters * args.batch) * 1e6
            print(f"{name:12s}: {us_img:8.1f} us/img   (checksum {chk:.1f})")
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name:12s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
