"""Dispatch-amortized A/B of SIFT descriptor-kernel accumulate variants.

One jit per variant runs the fused descriptor pass STEPS times via
lax.scan (varying the float operands so XLA can't hoist), so the relay's
~6 ms/dispatch floor amortizes away (docs/PERF.md round 3g). Prints one
JSON line per (radius, variant) with us/candidate, plus a max-abs-diff
fidelity check of every variant against the split baseline.

Run on the real TPU chip; give it a generous timeout (first compile of
each variant is ~20-40 s).
"""
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pyvisim_tpu.ops.pallas import sift_window as W

STEPS = 20
N_CAND = 2048
ROWS = 4096
W8 = 4096  # 512-px octave folded: W * 8


def make_inputs(radius: int, seed: int = 0):
    p, nh8, lw = W._window_geom(radius)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    atlas = jax.random.uniform(
        k1, (ROWS, 2, W8), jnp.bfloat16, 0.0, 2.0 * np.pi)
    rng = np.random.default_rng(seed)
    start_row = rng.integers(0, ROWS - nh8, N_CAND)
    lane = (rng.integers(0, (W8 - lw) // 128, N_CAND)) * 128
    s0 = rng.integers(0, 8, N_CAND)
    cres = rng.integers(0, 16, N_CAND)
    zi = np.zeros(N_CAND, np.int64)
    ints = jnp.asarray(np.stack(
        [start_row, zi, np.ones(N_CAND, np.int64), s0, cres, lane, zi, zi]
    ).astype(np.int32))
    scl = radius / (3.0 * 1.4142135623730951 * 2.5)
    flts = jnp.asarray(np.stack([
        np.full(N_CAND, scl), rng.uniform(0, 2 * np.pi, N_CAND),
        rng.uniform(radius + 2, 500 - radius, N_CAND),
        rng.uniform(radius + 2, 500 - radius, N_CAND),
        np.full(N_CAND, 512.0), np.full(N_CAND, 512.0),
    ], axis=1).astype(np.float32))
    return atlas, ints, flts


DEPTH = int(os.environ.get("PYVISIM_DESC_DEPTH", "2"))


def run_variant(radius, accumulate, atlas, ints, flts, gang=False, **kw):
    @jax.jit
    def loop(atlas0, ints0, flts0):
        def body(carry, step):
            f = flts0.at[:, 1].add(1e-6 * step.astype(jnp.float32))
            out = W.descriptor_window_pass(
                atlas0, ints0, f, radius=radius, accumulate=accumulate,
                depth=DEPTH, gang=gang, **kw)
            return carry + out.sum(), None

        tot, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(STEPS))
        return tot

    float(loop(atlas, ints, flts))  # compile + warm
    t0 = time.perf_counter()
    float(loop(atlas, ints, flts))
    dt = time.perf_counter() - t0
    return dt / (STEPS * N_CAND) * 1e6  # us per candidate


def _abl_scaffold_only(rbin, cbin, pos_o, mag, *, nh8):
    """Chunk loop deleted; consumes the scaffold outputs so XLA can't
    DCE the geometry/exp/mask math. Measures DMA + scaffold + epilogue.
    (Lane-axis reductions only: Mosaic rejects full multi-dim float
    reductions on offset layouts.)"""
    t = rbin + cbin + pos_o + mag  # (nh8, lw)
    red = jnp.sum(t, axis=1, keepdims=True)  # (nh8, 1)
    return jnp.full((4, 32), 1e-6) * red[0, 0]


def _abl_no_wo(rbin, cbin, pos_o, mag, *, nh8):
    """wo8 build + aco product deleted (hc broadcast stands in)."""
    f32 = jnp.float32
    k4 = jax.lax.broadcasted_iota(jnp.int32, (4, 1), 0).astype(f32)
    lw = rbin.shape[1]
    acc = [jnp.zeros((4, 8), f32) for _ in range(4)]
    # keep pos_o alive without its per-bin math (lane-axis reduction only:
    # Mosaic rejects multi-dim float reductions on offset layouts)
    po = jnp.sum(pos_o[0:1, :], axis=1, keepdims=True) * 1e-9
    for i0 in range(nh8):
        hr4m = (W._hat(rbin[i0:i0 + 1, :] - k4)
                * mag[i0:i0 + 1, :]).astype(jnp.bfloat16)
        hc4 = W._hat(cbin[i0:i0 + 1, :] - k4 + po)
        for ci in range(4):
            aco = jnp.broadcast_to(
                hc4[ci:ci + 1, :], (8, lw)).astype(jnp.bfloat16)
            acc[ci] = acc[ci] + jax.lax.dot_general(
                hr4m, aco, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
    return jnp.concatenate(acc, axis=1)


def _abl_no_dots(rbin, cbin, pos_o, mag, *, nh8):
    """MXU dots replaced by rank-1 reduction outer products: weight
    builds kept, contraction cost (mostly) removed."""
    f32 = jnp.float32
    k4 = jax.lax.broadcasted_iota(jnp.int32, (4, 1), 0).astype(f32)
    ko = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0).astype(f32)
    acc = [jnp.zeros((4, 8), f32) for _ in range(4)]
    for i0 in range(nh8):
        hr4m = (W._hat(rbin[i0:i0 + 1, :] - k4)
                * mag[i0:i0 + 1, :]).astype(jnp.bfloat16)
        hc4 = W._hat(cbin[i0:i0 + 1, :] - k4)
        do = jnp.abs(pos_o[i0:i0 + 1, :] - ko)
        wo8 = jnp.maximum(0.0, 1.0 - jnp.minimum(do, 8.0 - do))
        hsum = hr4m.astype(f32).sum(axis=1, keepdims=True)  # (4, 1)
        for ci in range(4):
            aco = (wo8 * hc4[ci:ci + 1, :]).astype(jnp.bfloat16)
            acc[ci] = acc[ci] + hsum * aco.astype(f32).sum(axis=1)
    return jnp.concatenate(acc, axis=1)


# name -> extra descriptor_window_pass kwargs (gang-kernel variants)
GANG_VARIANTS = {
    "gang_kernel": {},
    "gang_g16": {"group": 16},
    "gang_skip_dma": {"skip_dma": True},  # floor probe: garbage output
    "gang_skip_loop": {"skip_loop": True},  # floor probe: garbage output
}

VARIANTS = {
    "gang_kernel": W._desc_accumulate,  # routed to _desc_kernel_gang
    "gang_g16": W._desc_accumulate,
    "gang_skip_dma": W._desc_accumulate,
    "gang_skip_loop": W._desc_accumulate,
    "split_r3h": W._desc_accumulate_split,
    "merged_hats": W._desc_accumulate,
    "wide_dot": W._desc_accumulate_wide,
    "abl_scaffold_only": _abl_scaffold_only,
    "abl_no_wo": _abl_no_wo,
    "abl_no_dots": _abl_no_dots,
}


def main():
    radii = [int(r) for r in sys.argv[1:]] or [24, 40]
    for radius in radii:
        atlas, ints, flts = make_inputs(radius)
        base = np.asarray(W.descriptor_window_pass(
            atlas, ints, flts, radius=radius, gang=False,
            accumulate=W._desc_accumulate_split))
        only = os.environ.get("PYVISIM_DESC_ONLY", "")
        for name, fn in VARIANTS.items():
            if only and name not in only.split(","):
                continue
            gang = name in GANG_VARIANTS
            kw = GANG_VARIANTS.get(name, {})
            got = np.asarray(W.descriptor_window_pass(
                atlas, ints, flts, radius=radius, accumulate=fn,
                depth=DEPTH, gang=gang, **kw))
            dmax = float(np.abs(got - base).max())
            us = run_variant(radius, fn, atlas, ints, flts, gang=gang, **kw)
            print(json.dumps({
                "radius": radius, "variant": name, "depth": DEPTH,
                "us_per_cand": round(us, 3), "max_abs_diff": dmax,
            }), flush=True)


if __name__ == "__main__":
    main()
