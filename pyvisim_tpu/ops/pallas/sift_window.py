"""Fused SIFT window kernels: descriptor, orientation, refinement gather.

Parity anchor: OpenCV ``calcSIFTDescriptor`` semantics as implemented by
the XLA path in ``ops/sift.py::_descriptor`` (reference delegation point:
/root/reference/pyvisim/features/_features.py:78-79). This kernel is a
performance backend for the same math, selected by
``SiftConfig.patch_backend``; the XLA path remains the reference
implementation and both are cross-checked in tests/test_pallas.py.

Why a kernel: the XLA descriptor pass materializes its per-chunk
``(chunk, 36, n_pix)`` trilinear-weight tensors in HBM between the build
and the contraction, and pays vmapped-``dynamic_slice`` latency per
window gather. Here each grid step DMAs a GROUP of candidates'
folded-atlas windows straight into VMEM (group-double-buffered: group
i+1's copies are in flight while group i computes), builds the
hat-function weights row-chunk by row-chunk, and accumulates each
(4, 32) = (r, c*8+o) histogram in registers — descriptors leave the
kernel as the only HBM write. The candidate grouping amortizes the
per-grid-step pipeline overhead, measured at ~1.7 us/step with
per-candidate steps (docs/PERF.md round 3); per-candidate scalars ride
the scalar-prefetch SMEM arrays, so no per-step operand blocks remain.

Two descriptor-kernel layouts exist (round 5): the per-candidate kernel
(_desc_kernel — each candidate's window scaffold in its own predicated
region, scratch (depth, G, nh8, 2, lw)) and the production lane-GANGED
kernel for the small radius classes (_desc_kernel_gang — all windows of
a group side by side on the lane axis, ONE batched scaffold per grid
step; scratch (depth, nh8, 2, G*lw)). ``descriptor_window_pass(gang=
None)`` picks per measured radius-class winner; both are bit-identical
to the XLA path (tests/test_pallas.py).

Geometry mirrors ``ops/sift.py::_magang_window``: the atlas folds each
8-row chunk into the minor axis ((..., H8, 2, W*8), element
[h8, ch, w*8+s] = stack[ch, 8*h8+s, w]) and the kernel sees it as a
flat (rows, 2, W*8) ref — row starts land on an untiled dim and slice
freely; the channel pair on the second-minor dim matches bf16's 2-row
sublane packing and makes one DMA cover both channels. Lane starts are
16-column (128-lane) aligned and widths are full 128-lane tiles, with
the residuals absorbed by the mask math (mask-driven end to end — no
extraction step).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "descriptor_window_pass",
    "orientation_window_pass",
    "refine_gather_pass",
]

_D = 4  # spatial histogram grid
_N = 8  # orientation bins
_G = 8  # candidates per grid step


def _window_geom(radius: int):
    """Static window geometry for a radius class: h8-chunk count and the
    lane width of the 16-col-aligned window."""
    p = 2 * radius + 1
    nh8 = (p + 6) // 8 + 1
    # 16-col alignment slack (the col residual cres = ws - (ws//16)*16 is
    # at most 15, so a window spans <= p + 15 cols), folded 8 rows/col,
    # rounded up to a full 128-lane tile (DMA slice widths must be
    # lane-tile multiples). p + 15, not p + 16: every default radius
    # class has p = 2R + 1 == 1 (mod 16), so the off-by-one costs a whole
    # extra 128-lane tile of DMA + window math (640 -> 512 at R=24).
    lw = -(-(p + 15) * 8 // 128) * 128
    return p, nh8, lw


def _hat(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def _window_coords(nh8: int, lw: int):
    """Candidate-invariant window pixel coordinates for a radius class:
    (row_c, col_c) f32 grids of the folded (nh8, lw) window. Hoisted out
    of the per-candidate math (round 5): inside the unrolled _G-candidate
    loop each candidate sits in its own predicated region, so Mosaic does
    not CSE these ~8 iota/int ops across candidates — computing them once
    per grid step saves that work 7/8ths of the time."""
    i0g = jax.lax.broadcasted_iota(jnp.int32, (nh8, lw), 0)
    qg = jax.lax.broadcasted_iota(jnp.int32, (nh8, lw), 1)
    row_c = (8 * i0g + (qg % 8)).astype(jnp.float32)
    col_c = (qg // 8).astype(jnp.float32)
    return row_c, col_c


def _desc_accumulate(rbin, cbin, pos_o, mag, *, nh8: int):
    """Histogram accumulation over the window's nh8 row-chunks: returns
    the raw (4, 32) = (r, c*8+o) descriptor grid.

    Interior-only, fold-in-weights formulation: the r/c histogram
    borders (bins -1 and 4) only ever get DISCARDED — so build hat
    weights for the 4 interior bins only — and the circular o border
    (bin 8; bin 9 is structurally zero since pos_o < 8) folds onto
    bin 0 INSIDE the weight build: wo8[o] = hat(pos-o) + hat(pos-8-o).
    The two hats are mutually exclusive per pixel (pos<1 vs pos>7), so
    the bf16 product stream is bit-identical to folding after the
    accumulate, and hist[r, c*8+o] IS the final 4x4x8 descriptor grid:
    no 36-row repeat/tile expansions, no border fold, no 16-of-36
    compaction matmul.

    The r and c hat families build as ONE (8, lw) stream (rows 0-3
    r-bins, rows 4-7 c-bins): a (4, lw) f32 op pads to the same 4 vregs
    as an (8, lw) op on the 8-sublane VPU, so the merged build does the
    two families' hat math at one build's vreg cost. Measured effect is
    within noise (1.77 vs 1.79 us/cand, docs/PERF.md round 4) because
    the scaffold+DMA floor dominates the chunk; kept for the fewer ops.

    Per c we contract (4,lw)x(lw,8) on the MXU against the (8,lw)
    wo8*hc product — no (32,lw) materialization (a single batched
    contraction measured worse; see docs/PERF.md round-3g negative
    results on concat/batching).

    wo8 via circular hat distance: with po in [0, 8) and integer bins
    o in 0..7, d = po - o lies in [-7, 8), so min(|d|, 8 - |d|) < 1
    exactly where hat(d) + hat(d - 8) is nonzero (the two hats are
    mutually exclusive) and evaluates to the same f32 bits (all
    intermediates are exact f32 subtractions) — one hat instead of two.
    """
    f32 = jnp.float32
    ko = jax.lax.broadcasted_iota(jnp.int32, (_N, 1), 0).astype(f32)
    # rows 0-3 select rbin, rows 4-7 cbin; bin id is the row mod 4
    k8 = (jax.lax.broadcasted_iota(jnp.int32, (_N, 1), 0) % _D).astype(f32)
    rsel = jax.lax.broadcasted_iota(jnp.int32, (_N, 1), 0) < _D

    acc = [jnp.zeros((_D, _N), f32) for _ in range(_D)]
    for i0 in range(nh8):
        rc = jnp.where(rsel, rbin[i0:i0 + 1, :], cbin[i0:i0 + 1, :])
        hrc = _hat(rc - k8)  # (8, lw): rows 0-3 = hr, rows 4-7 = hc
        hr4m = (hrc[:_D] * mag[i0:i0 + 1, :]).astype(jnp.bfloat16)
        do = jnp.abs(pos_o[i0:i0 + 1, :] - ko)  # (8, lw)
        wo8 = jnp.maximum(0.0, 1.0 - jnp.minimum(do, float(_N) - do))
        for ci in range(_D):
            aco = (wo8 * hrc[_D + ci:_D + ci + 1, :]).astype(jnp.bfloat16)
            acc[ci] = acc[ci] + jax.lax.dot_general(
                hr4m, aco, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
    return jnp.concatenate(acc, axis=1)  # (4, 32) = (r, c*8+o)


def _desc_accumulate_split(rbin, cbin, pos_o, mag, *, nh8: int):
    """Round-3h accumulation (separate 4-row r/c hat builds): kept as the
    A/B baseline for tools/bench_desc_variants.py."""
    f32 = jnp.float32
    k4 = jax.lax.broadcasted_iota(jnp.int32, (_D, 1), 0).astype(f32)
    ko = jax.lax.broadcasted_iota(jnp.int32, (_N, 1), 0).astype(f32)
    acc = [jnp.zeros((_D, _N), f32) for _ in range(_D)]
    for i0 in range(nh8):
        hr4m = (_hat(rbin[i0:i0 + 1, :] - k4)
                * mag[i0:i0 + 1, :]).astype(jnp.bfloat16)  # (4, lw)
        hc4 = _hat(cbin[i0:i0 + 1, :] - k4)  # (4, lw)
        do = jnp.abs(pos_o[i0:i0 + 1, :] - ko)  # (8, lw)
        wo8 = jnp.maximum(0.0, 1.0 - jnp.minimum(do, float(_N) - do))
        for ci in range(_D):
            aco = (wo8 * hc4[ci:ci + 1, :]).astype(jnp.bfloat16)
            acc[ci] = acc[ci] + jax.lax.dot_general(
                hr4m, aco, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
    return jnp.concatenate(acc, axis=1)


def _desc_accumulate_wide(rbin, cbin, pos_o, mag, *, nh8: int):
    """Single (32, lw) weight build + ONE MXU dot per chunk (A/B
    candidate): tiles wo8 and repeats the c-hats on the sublane axis so
    the whole (4, 32) grid accumulates in one contraction."""
    f32 = jnp.float32
    ko = jax.lax.broadcasted_iota(jnp.int32, (_N, 1), 0).astype(f32)
    k8 = (jax.lax.broadcasted_iota(jnp.int32, (_N, 1), 0) % _D).astype(f32)
    rsel = jax.lax.broadcasted_iota(jnp.int32, (_N, 1), 0) < _D
    acc = jnp.zeros((_D, _D * _N), f32)
    for i0 in range(nh8):
        rc = jnp.where(rsel, rbin[i0:i0 + 1, :], cbin[i0:i0 + 1, :])
        hrc = _hat(rc - k8)
        hr4m = (hrc[:_D] * mag[i0:i0 + 1, :]).astype(jnp.bfloat16)
        do = jnp.abs(pos_o[i0:i0 + 1, :] - ko)
        wo8 = jnp.maximum(0.0, 1.0 - jnp.minimum(do, float(_N) - do))
        # product in f32 then one cast, matching the split/merged baselines'
        # rounding order so an A/B delta isolates the contraction
        # restructure itself (ADVICE r4)
        w32 = (jnp.tile(wo8, (_D, 1))
               * jnp.repeat(hrc[_D:], _N, axis=0)).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            hr4m, w32, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
    return acc


def _candidate_descriptor(mag_w, ang, scl, theta, r, c, h, w_dim, s0, cres,
                          coords, *, radius: int, nh8: int, lw: int,
                          accumulate=_desc_accumulate):
    """OpenCV calcSIFTDescriptor math over one (nh8, lw) mag/ang window.
    Mirrors ops/sift.py::_descriptor (see its comments); all masks are
    window-relative so alignment residuals (s0 rows, cres cols) need no
    extraction. ``coords`` is the hoisted (row_c, col_c) pair from
    _window_coords. Returns the (4, 32) = (r, c*8+o) descriptor grid,
    already normalized and rounded (row-major flatten is the standard
    SIFT 128-D layout)."""
    row_c, col_c = coords
    R = float(radius)
    ii = row_c - (s0 + R)
    jj = col_c - (R + cres)  # col = ws16 + q//8 = ws - cres + q//8

    hist_width = 3.0 * scl
    cos_t = jnp.cos(theta) / hist_width
    sin_t = jnp.sin(theta) / hist_width
    bins_per_rad = _N / (2.0 * np.pi)
    exp_scale = -1.0 / (_D * _D * 0.5)
    radius_f = jnp.round(hist_width * 1.4142135623730951 * (_D + 1) * 0.5)

    # Window bound (|ii| <= R) and gaussian-support bound
    # (|ii| <= radius_f) fused through one scalar min: ii/jj, R, and
    # radius_f are all exactly representable integers in f32 (row_c,
    # s0, cres, R integral; radius_f a jnp.round output), so
    # |x| <= min(R, rf) has bit-identical truth values to
    # (x >= -R) & (x <= R) & (|x| <= rf) — 5 fewer vector ops per
    # candidate, verified by the kernel-vs-XLA bit-parity gates.
    #
    # Two further mask chains the XLA reference path carries are DROPPED
    # here, bit-identically (round 5, scaffold-bound ablation):
    # - the image-interior check (rr/cc within [1, dim-2]): the dense
    #   atlas zeroes mag on exactly that ring (_magang_stacks) and the
    #   surrounding pad, so excluded pixels already contribute
    #   hat * mag = hat * 0 = 0 to every accumulate (ang there is
    #   finite, so no NaN can propagate through the product);
    # - the (rbin, cbin) in (-1, 4) window check: the interior-only hat
    #   build evaluates to exact 0 for every bin when rbin <= -1 or
    #   rbin >= 4 (hat support is (bin-1, bin+1)), so gated pixels
    #   produce all-zero rows of hr4m regardless of the gate.
    # Both removals leave every accumulated term's f32 bits unchanged
    # (identical nonzero terms, exact +-0 elsewhere, same summation
    # order) — verified by the kernel-vs-XLA bit-parity gates.
    m_eff = jnp.minimum(R, radius_f)  # scalar
    ok = (jnp.abs(ii) <= m_eff) & (jnp.abs(jj) <= m_eff)

    c_rot = jj * cos_t - ii * sin_t
    r_rot = jj * sin_t + ii * cos_t
    rbin = r_rot + _D / 2 - 0.5
    cbin = c_rot + _D / 2 - 0.5
    obin = (ang - theta) * bins_per_rad
    wgt = jnp.exp((c_rot * c_rot + r_rot * r_rot) * exp_scale)
    mag = jnp.where(ok, mag_w * wgt, 0.0)

    # obin mod 8 as a pure-float wrap: obin * 0.125 is exact (power-of-two
    # scale), so the final subtraction is the only rounding — equivalent
    # to the int-cast floor/mod/mod chain it replaces within 1 ulp (single
    # rounding here vs double rounding there; ~0.2% of f32 inputs differ
    # by 1 ulp, max ~5e-7, which vanishes under the descriptor's integer
    # rounding), at 4 VPU ops vs ~8.
    pos_o = obin - 8.0 * jnp.floor(obin * 0.125)

    vec = accumulate(rbin, cbin, pos_o, mag, nh8=nh8)

    nrm2 = jnp.sum(vec * vec)
    thr = jnp.sqrt(nrm2) * 0.2
    vec = jnp.minimum(vec, thr)
    nrm2 = jnp.sum(vec * vec)
    scale = 512.0 / jnp.maximum(jnp.sqrt(nrm2), 1e-12)
    return jnp.round(jnp.minimum(vec * scale, 255.0))


def _gang_scalar_map(blk, vals):
    """(1, G*lw) lane map carrying ``vals[k]`` on candidate k's lane
    block (``blk`` = lane // lw int32 iota). G where-ops on one thin
    row — the price of batching per-candidate scalars into the gang
    scaffold (see _desc_kernel_gang)."""
    m = jnp.zeros(blk.shape, jnp.float32)
    for k, v in enumerate(vals):
        m = jnp.where(blk == k, v, m)
    return m


def _desc_kernel_gang(iref, fref, atlas_ref, out_ref, sb, sems, *,
                      radius: int, nh8: int, lw: int, depth: int = 2,
                      grp: int = _G, skip_dma: bool = False,
                      skip_loop: bool = False):
    """Lane-ganged variant of _desc_kernel: the _G candidates' windows
    land side by side on the LANE axis (scratch (depth, nh8, 2, _G*lw),
    window k on lanes [k*lw, (k+1)*lw)), and the per-candidate window
    scaffold — geometry, rotation, masks, exp, orientation wrap — runs
    ONCE per grid step as (nh8, _G*lw) ops instead of _G separate
    predicated regions. Round-5 motivation: the official metric stayed
    flat (126 -> 125 img/s) after deleting ~17 scaffold ops/candidate,
    so the descriptor pass is bound by per-candidate region issue
    overhead, not vector-op count; ganging divides that overhead by _G.

    Bit parity with the per-candidate kernel: every scaffold op is
    lane-local with identical per-lane operands (per-candidate scalars
    enter via exact lane-block selects), the hat builds batch the same
    way, and the MXU dots contract the same (4, lw)x(lw, 8) per-candidate
    lane slices in the same order — verified by
    tests/test_pallas.py::test_sift_descriptor_window_kernel_matches_xla
    (gang vs XLA) and the harness fidelity column (gang vs split).
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    f32 = jnp.float32

    def mk(slot, g, k):
        j = g * grp + k
        return pltpu.make_async_copy(
            atlas_ref.at[
                pl.ds(iref[0, j], nh8), :,
                pl.ds(pl.multiple_of(iref[5, j], 128), lw)],
            sb.at[slot, :, :, k * lw:(k + 1) * lw],
            sems.at[slot, k],
        )

    def start(slot, g):
        for k in range(grp):
            @pl.when(iref[2, g * grp + k] > 0)
            def _():
                mk(slot, g, k).start()

    if not skip_dma:  # skip_dma = floor ablation: no copies/waits,
        # compute runs on stale VMEM (harness-only, outputs garbage)
        @pl.when(i == 0)
        def _():
            start(0, 0)
            for g in range(1, depth - 1):
                @pl.when(g < n)
                def _(g=g):
                    start(g % depth, g)

        @pl.when(i + depth - 1 < n)
        def _():
            start((i + depth - 1) % depth, i + depth - 1)

        for k in range(grp):
            @pl.when(iref[2, i * grp + k] > 0)
            def _(k=k):
                mk(i % depth, i, k).wait()

    # --- batched scaffold over all _G windows ------------------------
    glw = grp * lw
    i0g = jax.lax.broadcasted_iota(jnp.int32, (nh8, glw), 0)
    qg = jax.lax.broadcasted_iota(jnp.int32, (nh8, glw), 1)
    lane = qg % lw  # candidate-relative lane (lw is a multiple of 128)
    row_c = (8 * i0g + (lane % 8)).astype(f32)
    col_c = (lane // 8).astype(f32)
    blk = qg // lw  # candidate index per lane block

    R = float(radius)
    a_v, b_v, cos_v, sin_v, th_v, me_v = [], [], [], [], [], []
    for k in range(grp):
        j = i * grp + k
        scl, theta = fref[0, j], fref[1, j]
        hist_width = 3.0 * scl
        a_v.append(iref[3, j].astype(f32) + R)      # s0 + R
        b_v.append(R + iref[4, j].astype(f32))      # R + cres
        cos_v.append(jnp.cos(theta) / hist_width)
        sin_v.append(jnp.sin(theta) / hist_width)
        th_v.append(theta)
        radius_f = jnp.round(
            hist_width * 1.4142135623730951 * (_D + 1) * 0.5)
        me_v.append(jnp.minimum(R, radius_f))
    a_m = _gang_scalar_map(blk[:1], a_v)
    b_m = _gang_scalar_map(blk[:1], b_v)
    cos_m = _gang_scalar_map(blk[:1], cos_v)
    sin_m = _gang_scalar_map(blk[:1], sin_v)
    th_m = _gang_scalar_map(blk[:1], th_v)
    me_m = _gang_scalar_map(blk[:1], me_v)

    mag_w = sb[i % depth, :, 0, :].astype(f32)  # (nh8, glw)
    ang = sb[i % depth, :, 1, :].astype(f32)

    ii = row_c - a_m
    jj = col_c - b_m
    # mask semantics identical to _candidate_descriptor (see its
    # comment block: image-bound and rbin/cbin checks dropped
    # bit-identically against the ring-zeroed atlas)
    ok = (jnp.abs(ii) <= me_m) & (jnp.abs(jj) <= me_m)
    c_rot = jj * cos_m - ii * sin_m
    r_rot = jj * sin_m + ii * cos_m
    rbin = r_rot + _D / 2 - 0.5
    cbin = c_rot + _D / 2 - 0.5
    obin = (ang - th_m) * (_N / (2.0 * np.pi))
    exp_scale = -1.0 / (_D * _D * 0.5)
    wgt = jnp.exp((c_rot * c_rot + r_rot * r_rot) * exp_scale)
    mag = jnp.where(ok, mag_w * wgt, 0.0)
    pos_o = obin - 8.0 * jnp.floor(obin * 0.125)

    # --- batched hat builds, wide accumulate: ONE (4, lw)x(lw, 32)
    # MXU dot per (chunk, candidate) — the wide contraction measured
    # fastest per-candidate (1.56/1.83 us/cand at R=24/40 vs 1.73/2.17
    # merged) and is bit-identical since the ADVICE-r4 rounding-order
    # fix (f32 weight product, one bf16 cast, same per-term bits and
    # f32 accumulation order as the 4-dot form)
    ko = jax.lax.broadcasted_iota(jnp.int32, (_N, 1), 0).astype(f32)
    k8 = (jax.lax.broadcasted_iota(jnp.int32, (_N, 1), 0) % _D).astype(f32)
    rsel = jax.lax.broadcasted_iota(jnp.int32, (_N, 1), 0) < _D
    acc = [jnp.zeros((_D, _D * _N), f32) for _ in range(grp)]
    if skip_loop:  # floor ablation: chunk loop deleted, scaffold kept
        # alive through a lane reduction (harness-only, garbage output)
        red = jnp.sum(rbin + cbin + pos_o + mag, axis=1, keepdims=True)
        acc = [a + red[0, 0] * 1e-6 for a in acc]
    for i0 in range(0 if skip_loop else nh8):
        rc = jnp.where(rsel, rbin[i0:i0 + 1, :], cbin[i0:i0 + 1, :])
        hrc = _hat(rc - k8)  # (8, glw)
        hr4m = (hrc[:_D] * mag[i0:i0 + 1, :]).astype(jnp.bfloat16)
        do = jnp.abs(pos_o[i0:i0 + 1, :] - ko)
        wo8 = jnp.maximum(0.0, 1.0 - jnp.minimum(do, float(_N) - do))
        w32 = (jnp.tile(wo8, (_D, 1))
               * jnp.repeat(hrc[_D:], _N, axis=0)).astype(jnp.bfloat16)
        for k in range(grp):
            acc[k] = acc[k] + jax.lax.dot_general(
                hr4m[:, k * lw:(k + 1) * lw],
                w32[:, k * lw:(k + 1) * lw],
                (((1,), (1,)), ((), ())),
                preferred_element_type=f32)

    for k in range(grp):
        active = iref[2, i * grp + k] > 0

        @pl.when(jnp.logical_not(active))
        def _(k=k):
            out_ref[k] = jnp.zeros((_D, 4 * _N), f32)

        @pl.when(active)
        def _(k=k):
            vec = acc[k]  # (4, 32)
            nrm2 = jnp.sum(vec * vec)
            thr = jnp.sqrt(nrm2) * 0.2
            vec = jnp.minimum(vec, thr)
            nrm2 = jnp.sum(vec * vec)
            scale = 512.0 / jnp.maximum(jnp.sqrt(nrm2), 1e-12)
            out_ref[k] = jnp.round(jnp.minimum(vec * scale, 255.0))


def _desc_kernel(iref, fref, atlas_ref, out_ref, sb, sems, *,
                 radius: int, nh8: int, lw: int, depth: int = 2,
                 accumulate=_desc_accumulate):
    """_G candidates per grid step, group-buffered DMAs (``depth`` groups
    of window copies in flight; 2 = classic double buffering).

    iref (8, n) int32 scalar-prefetch rows:
      0 window start row in the flat (rows, 2, W*8) atlas (one DMA
      covers both mag/ang channels on the second-minor dim), 2 active
      flag, 3 row residual s0 (0..7), 4 col residual (0..15), 5 aligned
      lane start (multiple of 128).
    fref (8, n) f32 scalar-prefetch rows: 0 scl_oct, 1 theta, 2 r, 3 c,
      4 h, 5 w.
    out (_G, 4, 32) f32 block per step ((r, c*8+o) descriptor grids;
    flattened to 128 by the caller).
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    f32 = jnp.float32

    def mk(slot, g, k):
        j = g * _G + k
        return pltpu.make_async_copy(
            atlas_ref.at[
                pl.ds(iref[0, j], nh8), :,
                pl.ds(pl.multiple_of(iref[5, j], 128), lw)],
            sb.at[slot, k],
            sems.at[slot, k],
        )

    def start(slot, g):
        for k in range(_G):
            @pl.when(iref[2, g * _G + k] > 0)
            def _():
                mk(slot, g, k).start()

    @pl.when(i == 0)
    def _():
        start(0, 0)
        for g in range(1, depth - 1):
            @pl.when(g < n)
            def _(g=g):
                start(g % depth, g)

    @pl.when(i + depth - 1 < n)
    def _():
        start((i + depth - 1) % depth, i + depth - 1)

    coords = _window_coords(nh8, lw)
    for k in range(_G):
        j = i * _G + k
        active = iref[2, j] > 0

        @pl.when(jnp.logical_not(active))
        def _():
            out_ref[k] = jnp.zeros((_D, 4 * _N), f32)

        @pl.when(active)
        def _():
            mk(i % depth, i, k).wait()
            mag_w = sb[i % depth, k, :, 0, :].astype(f32)  # (nh8, lw)
            ang = sb[i % depth, k, :, 1, :].astype(f32)
            out_ref[k] = _candidate_descriptor(
                mag_w, ang,
                fref[0, j], fref[1, j], fref[2, j], fref[3, j],
                fref[4, j], fref[5, j],
                iref[3, j].astype(f32), iref[4, j].astype(f32),
                coords,
                radius=radius, nh8=nh8, lw=lw, accumulate=accumulate)


@functools.partial(
    jax.jit,
    static_argnames=("radius", "interpret", "accumulate", "depth",
                     "gang", "group", "skip_dma", "skip_loop"))
def descriptor_window_pass(atlas_flat, ints, flts, *, radius: int,
                           interpret: bool = False,
                           accumulate=_desc_accumulate_wide,
                           depth: int = 2, gang: bool | None = None,
                           group: int | None = None,
                           skip_dma: bool = False,
                           skip_loop: bool = False):
    """Run the fused descriptor kernel over a candidate chunk.

    atlas_flat: (rows, 2, W8) folded atlas view (see ops/sift.py).
    ints: (8, n) int32 (see _desc_kernel). flts: (n, 8) float32.
    ``depth`` window-copy groups stay in flight (A/B knob; see
    docs/PERF.md round 5). ``gang`` selects the lane-ganged kernel
    (_desc_kernel_gang — one batched scaffold per grid step);
    gang=None picks the measured-fastest kernel per radius class
    (gang at R <= 24: 1.42 vs 1.78 us/cand; per-candidate wide
    accumulate above: 1.83 vs 2.05 at R=40 — the batched (8, G*lw)
    hat builds outgrow their win at 48-lane-tile widths). gang=False
    with ``accumulate`` hosts the A/B variants
    (tools/bench_desc_variants.py).
    Returns (n, 128) float32 descriptors (zeros for inactive rows).
    """
    if gang is None:
        gang = radius <= 24
    # group is a gang-kernel knob; 16 measured fastest for the gang
    # classes (1.38 vs 1.43 us/cand at G=8, R=24 — halves the per-step
    # fixed overhead share; docs/PERF.md round 5)
    grp = (group or 16) if gang else _G
    n = ints.shape[1]
    n_pad = -(-n // grp) * grp
    if n_pad != n:
        ints = jnp.pad(ints, ((0, 0), (0, n_pad - n)))
        flts = jnp.pad(flts, ((0, n_pad - n), (0, 0)))
    _, nh8, lw = _window_geom(radius)
    if gang:  # ``accumulate`` is a per-candidate-kernel knob; the gang
        # kernel has one (production) accumulate form
        scratch = pltpu.VMEM((depth, nh8, 2, grp * lw), atlas_flat.dtype)
        kern = functools.partial(_desc_kernel_gang, radius=radius,
                                 nh8=nh8, lw=lw, depth=depth, grp=grp,
                                 skip_dma=skip_dma, skip_loop=skip_loop)
    else:
        scratch = pltpu.VMEM((depth, _G, nh8, 2, lw), atlas_flat.dtype)
        kern = functools.partial(_desc_kernel, radius=radius, nh8=nh8,
                                 lw=lw, depth=depth, accumulate=accumulate)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pad // grp,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((grp, _D, 4 * _N), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            scratch,
            pltpu.SemaphoreType.DMA((depth, grp)),
        ],
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_pad, _D, 4 * _N), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ints, flts.T, atlas_flat)
    return out.reshape(n_pad, 128)[:n]


def _roll36(h, s):
    """Static circular roll of a (36, G) histogram block along the bin
    (sublane) axis by s (concat+slice — dynamic_rotate is unneeded for
    static shifts and sublane rolls of non-32-bit data don't lower)."""
    sm = s % 36  # normalize negative shifts
    h2 = jnp.concatenate([h, h], axis=0)
    return h2[36 - sm:72 - sm, :]


def _pick36(h, idx_row):
    """h[(idx_row) % 36, g] per lane g for a traced (1, G) int row, as a
    one-hot reduction (dynamic gathers don't lower in Pallas TPU)."""
    k = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0)
    sel = k == ((idx_row % 36) + 36) % 36
    return jnp.sum(jnp.where(sel, h, 0.0), axis=0, keepdims=True)


def _candidate_ori_hist(mag_w, ang, scl, theta_unused, r, c, h, w_dim,
                        s0, cres, coords, *, radius: int, nh8: int, lw: int):
    """OpenCV dominant-orientation raw histogram over one (nh8, lw)
    mag/ang window; mirrors ops/sift.py::_orientation. ``coords`` is the
    hoisted (row_c, col_c) pair from _window_coords. Returns the
    unsmoothed (36, 1) histogram — smoothing/peak-finding runs once per
    grid step over all _G candidates (_group_ori_peaks)."""
    f32 = jnp.float32
    row_c, col_c = coords
    R = float(radius)
    ii = row_c - (s0 + R)
    jj = col_c - (R + cres)

    radius_f = jnp.round(4.5 * scl)  # SIFT_ORI_RADIUS = 3 * 1.5
    sigma_w = 1.5 * scl
    exp_scale = -1.0 / (2.0 * sigma_w * sigma_w)
    # fused window/support bound via scalar min — bit-equivalent; see
    # the identical rewrite in _candidate_descriptor. The image-interior
    # check (rr/cc within [1, dim-2]) the XLA path carries is dropped
    # bit-identically: the dense atlas zeroes mag on exactly that ring
    # (_magang_stacks round 5) and the surrounding pad, so those pixels
    # contribute exact 0 through the mag_w factor (ang there is finite:
    # the one-hot row is well-defined and scaled by 0).
    m_eff = jnp.minimum(R, radius_f)
    in_radius = (jnp.abs(ii) <= m_eff) & (jnp.abs(jj) <= m_eff)
    wm = jnp.where(in_radius,
                   jnp.exp((ii * ii + jj * jj) * exp_scale) * mag_w, 0.0)

    n_bins = 36
    fbin = ang * (n_bins / (2.0 * np.pi))
    bin_idx = jnp.round(fbin).astype(jnp.int32) % n_bins  # OpenCV cvRound
    k36 = jax.lax.broadcasted_iota(jnp.int32, (n_bins, 1), 0)
    hist = jnp.zeros((n_bins, 1), f32)
    for i0 in range(nh8):
        oh = (bin_idx[i0:i0 + 1, :] == k36).astype(f32)  # (36, lw)
        hist = hist + jnp.sum(oh * wm[i0:i0 + 1, :], axis=1, keepdims=True)
    return hist


def _group_ori_peaks(hist, G):
    """Smoothing + parabolic peak-finding over a (36, G) block of raw
    histograms (candidates on lanes). The ~30 tiny 36-element ops here
    measured 43% of the whole kernel when run per candidate on (36, 1)
    arrays (five near-empty vregs each); batching the grid step's _G
    candidates into the lane axis runs them at identical vreg cost,
    amortized G-ways. A zero column (inactive candidate) yields exactly
    (0.0, 0.0, False), matching the old inactive-branch output. Returns
    (1, G) rows: theta, theta2, has_second (as f32 0/1)."""
    f32 = jnp.float32
    n_bins = 36
    k36g = jax.lax.broadcasted_iota(jnp.int32, (n_bins, G), 0)

    # circular smoothing [1,4,6,4,1]/16
    hist = (
        (_roll36(hist, 2) + _roll36(hist, -2)) * (1.0 / 16.0)
        + (_roll36(hist, 1) + _roll36(hist, -1)) * (4.0 / 16.0)
        + hist * (6.0 / 16.0)
    )

    def argmax_rows(v):
        # first-max row index per lane, as (1, G) int32 (jnp.argmax's
        # first-occurrence tie-break, kept 2-D for Mosaic)
        m = jnp.max(v, axis=0, keepdims=True)
        return jnp.min(jnp.where(v == m, k36g, n_bins), axis=0,
                       keepdims=True)

    def peak_theta(peak):
        l_ = _pick36(hist, peak - 1)
        c_ = _pick36(hist, peak)
        r_ = _pick36(hist, peak + 1)
        denom = l_ - 2.0 * c_ + r_
        interp = jnp.where(jnp.abs(denom) > 1e-12,
                           0.5 * (l_ - r_) / denom, 0.0)
        return (peak.astype(f32) + interp) * (2.0 * np.pi / n_bins)

    peak = argmax_rows(hist)
    theta = peak_theta(peak)

    left = _roll36(hist, 1)
    right = _roll36(hist, -1)
    omax = _pick36(hist, peak)
    is_peak = (hist > left) & (hist >= right) & (hist >= 0.8 * omax)
    is_peak = is_peak & (k36g != peak)
    second = argmax_rows(jnp.where(is_peak, hist, -jnp.inf))
    has_second = jnp.any(is_peak, axis=0, keepdims=True)
    theta2 = jnp.where(has_second, peak_theta(second % n_bins), 0.0)
    return theta, theta2, has_second.astype(f32)


def _ori_kernel(iref, fref, atlas_ref, out_ref, sb, sems, hist_sc, *,
                radius: int, nh8: int, lw: int, depth: int = 2):
    """Same scaffold as _desc_kernel; raw histograms land per candidate
    in the (36, _G) hist_sc scratch (candidates on lanes), then ONE
    vectorized smoothing/peak pass per grid step writes the (3, _G) out
    block of [theta; theta2; has_second] rows."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    f32 = jnp.float32

    def mk(slot, g, k):
        j = g * _G + k
        return pltpu.make_async_copy(
            atlas_ref.at[
                pl.ds(iref[0, j], nh8), :,
                pl.ds(pl.multiple_of(iref[5, j], 128), lw)],
            sb.at[slot, k],
            sems.at[slot, k],
        )

    def start(slot, g):
        for k in range(_G):
            @pl.when(iref[2, g * _G + k] > 0)
            def _():
                mk(slot, g, k).start()

    @pl.when(i == 0)
    def _():
        start(0, 0)
        for g in range(1, depth - 1):
            @pl.when(g < n)
            def _(g=g):
                start(g % depth, g)

    @pl.when(i + depth - 1 < n)
    def _():
        start((i + depth - 1) % depth, i + depth - 1)

    coords = _window_coords(nh8, lw)
    for k in range(_G):
        j = i * _G + k
        active = iref[2, j] > 0

        @pl.when(jnp.logical_not(active))
        def _():
            hist_sc[:, k:k + 1] = jnp.zeros((36, 1), f32)

        @pl.when(active)
        def _():
            mk(i % depth, i, k).wait()
            mag_w = sb[i % depth, k, :, 0, :].astype(f32)
            ang = sb[i % depth, k, :, 1, :].astype(f32)
            hist_sc[:, k:k + 1] = _candidate_ori_hist(
                mag_w, ang,
                fref[0, j], fref[1, j], fref[2, j], fref[3, j],
                fref[4, j], fref[5, j],
                iref[3, j].astype(f32), iref[4, j].astype(f32),
                coords,
                radius=radius, nh8=nh8, lw=lw)

    theta, theta2, hs = _group_ori_peaks(hist_sc[:, :], _G)
    out_ref[0] = jnp.concatenate([theta, theta2, hs], axis=0)  # (3, _G)


@functools.partial(
    jax.jit, static_argnames=("radius", "interpret", "depth"))
def orientation_window_pass(atlas_flat, ints, flts, *, radius: int,
                            interpret: bool = False, depth: int = 2):
    """Run the fused orientation kernel over a candidate chunk.
    Same operands as descriptor_window_pass; returns (theta, theta2,
    has_second) arrays of shape (n,)."""
    n = ints.shape[1]
    n_pad = -(-n // _G) * _G
    if n_pad != n:
        ints = jnp.pad(ints, ((0, 0), (0, n_pad - n)))
        flts = jnp.pad(flts, ((0, n_pad - n), (0, 0)))
    _, nh8, lw = _window_geom(radius)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pad // _G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 3, _G), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((depth, _G, nh8, 2, lw), atlas_flat.dtype),
            pltpu.SemaphoreType.DMA((depth, _G)),
            pltpu.VMEM((36, _G), jnp.float32),
        ],
    )
    kern = functools.partial(_ori_kernel, radius=radius, nh8=nh8, lw=lw,
                             depth=depth)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_pad // _G, 3, _G), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ints, flts.T, atlas_flat)
    out = out.transpose(0, 2, 1).reshape(n_pad, 3)[:n]  # XLA, not Mosaic
    return out[:, 0], out[:, 1], out[:, 2] > 0.5


def _refine_gather_kernel(iref, atlas_ref, out_ref, sems, *,
                          n_layers: int, lw: int, nq: int):
    """Pure-DMA gather of refinement scale-cube windows: _G candidates
    per grid step, each ONE (nq, L+2, lw) copy straight into the output
    block (the 8 in-flight copies of a group hide each other's latency;
    the refinement MATH stays on the XLA path, whose chunk-batched
    einsums beat a per-candidate in-kernel port on the MXU).

    iref (8, n) int32 rows: 0 window start row in the flat
    (B*H8, L+2, W*8) DoG, 2 active flag, 5 aligned lane start
    (multiple of 128)."""
    i = pl.program_id(0)

    for k in range(_G):
        j = i * _G + k
        active = iref[2, j] > 0

        @pl.when(active)
        def _():
            pltpu.make_async_copy(
                atlas_ref.at[
                    pl.ds(iref[0, j], nq), :,
                    pl.ds(pl.multiple_of(iref[5, j], 128), lw)],
                out_ref.at[k],
                sems.at[k],
            ).start()

    for k in range(_G):
        j = i * _G + k
        active = iref[2, j] > 0

        @pl.when(active)
        def _():
            pltpu.make_async_copy(
                atlas_ref.at[
                    pl.ds(iref[0, j], nq), :,
                    pl.ds(pl.multiple_of(iref[5, j], 128), lw)],
                out_ref.at[k],
                sems.at[k],
            ).wait()

        @pl.when(jnp.logical_not(active))
        def _():
            out_ref[k] = jnp.zeros((nq, n_layers, lw), out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_layers", "side", "nq", "interpret"))
def refine_gather_pass(dog_flat, ints, *, n_layers: int, side: int,
                       nq: int = 2, interpret: bool = False):
    """Gather (n, nq, L+2, lw) refinement windows from the flat folded
    DoG (rows, L+2, W*8), lw = (side+16)*8 rounded up to a full 128-lane
    tile (16-col alignment slack; 256 at the default refine_reach=3).
    ints as in _refine_gather_kernel."""
    n = ints.shape[1]
    n_pad = -(-n // _G) * _G
    if n_pad != n:
        ints = jnp.pad(ints, ((0, 0), (0, n_pad - n)))
    lw = -(-(side + 16) * 8 // 128) * 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // _G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (_G, nq, n_layers, lw), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_G,))],
    )
    kern = functools.partial(_refine_gather_kernel, n_layers=n_layers,
                             lw=lw, nq=nq)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_pad, nq, n_layers, lw),
                                       dog_flat.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ints, dog_flat)
    return out[:n]
