"""SIFT on TPU: batched JAX implementation of detect + describe.

TPU-native replacement for OpenCV's C++ ``SIFT.detectAndCompute``
(reference call sites: pyvisim/features/_features.py:78-79, 110-111). The
algorithm follows Lowe (IJCV 2004) with OpenCV's constants and formulas:

  * Gaussian pyramid (separable convs), optional initial 2x upscale
    (OpenCV ``firstOctave = -1``), ``nOctaveLayers + 3`` images per octave
  * DoG extrema over 3x3x3 neighborhoods with the 8-bit prelim threshold
    ``floor(0.5 * contrast/n_layers * 255)``
  * iterative subpixel refinement (quadratic fit, 5 steps), contrast and
    Harris-style edge rejection (``tr^2/det < (r+1)^2/r``)
  * dominant gradient orientation from a smoothed 36-bin histogram with
    parabolic peak interpolation
  * 4x4x8 descriptor with OpenCV's exact trilinear weighting, Gaussian
    window, 0.2 clip, renormalize to 512, saturate at 255

Static-shape design (everything jits):
  * images are letterboxed to a fixed ``process_size`` square
  * each octave refines a fixed candidate budget (top-|DoG| responses)
  * orientation / descriptor histograms are **dense einsums** — per pixel
    the trilinear weights form a rank-1 tensor product of small one-hot
    mixes, so the whole histogram is a (P, 36) / (P,6)x(P,6)x(P,10)
    contraction on the MXU instead of a scatter
  * the final keypoint set is the global top ``max_keypoints`` by
    |contrast| with a validity mask

Deliberate deviations from OpenCV (gated on retrieval-metric parity, see
SURVEY.md §7 hard-part 1): fixed processing resolution; at most one
secondary-orientation duplicate per keypoint (OpenCV emits one per peak
>= 0.8 * max; more than two such peaks is rare); float32 DoG throughout —
OpenCV's 8-bit path quantizes the pyramid to 1/48 steps, which suppresses
some weak low-contrast extrema that we (correctly) detect, so our keypoint
sets are supersets of OpenCV's at matching descriptor quality. Raise
``contrast_threshold`` to thin them if needed.
"""
from __future__ import annotations

import dataclasses
import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .gaussian import gaussian_blur_batch

__all__ = ["SiftConfig", "sift_single", "sift_batch", "sift_descriptors"]


@dataclasses.dataclass(frozen=True)
class SiftConfig:
    n_octave_layers: int = 3
    sigma: float = 1.6
    contrast_threshold: float = 0.04
    edge_threshold: float = 10.0
    process_size: int = 512
    upscale: bool = True  # OpenCV firstOctave = -1
    max_keypoints: int = 2048
    ori_patch_radius: int = 16  # >= round(4.5 * sigma * 2^(3.5/3)) = 16
    desc_patch_radius: int = 40  # >= hist_width * sqrt(2) * 2.5 at max scale
    # Per-scale-class patch radii: keypoints are binned by the radius their
    # scale actually needs (ori: round(4.5*scl); desc: round(10.607*scl))
    # and each class runs its own fixed-radius pass — small-scale keypoints
    # (the majority on natural images) stop paying the worst-case 81x81
    # patch area. The last entry must equal the *_patch_radius pad.
    ori_radius_classes: tuple[int, ...] = (12, 16)
    desc_radius_classes: tuple[int, ...] = (24, 32, 40)
    # Orientation/descriptor patches and their histogram contractions run
    # in bfloat16 (magnitude/angle atlas storage + MXU inputs); the
    # histogram accumulation and all detection math stay float32.
    atlas_dtype: str = "bfloat16"
    refine_steps: int = 5
    # Spatial reach of the refinement's local patch (the iteration may
    # move at most this many pixels from the detected extremum before the
    # candidate is rejected as unstable). OpenCV re-centers globally for
    # up to refine_steps single steps; moves beyond +-3 px essentially
    # never survive the contrast/edge gates, and the patch gather is the
    # detection stage's bandwidth bill: side = 2*reach+3 shrinks it
    # quadratically (13^2 -> 9^2 is 2.1x less).
    refine_reach: int = 3
    # Patch gather dtype for the (L+2, side, side) candidate patches.
    # bfloat16 halves the gather bill and costs only ~0.4% input noise
    # (values are bounded below by the prelim threshold), but on current
    # Mosaic the bf16 cube-select einsums lower to layout-shuffled MXU
    # ops that eat the saving — float32 measures faster end-to-end.
    refine_dtype: str = "float32"
    # OpenCV emits an extra keypoint per secondary orientation peak
    # >= 0.8 * max (SIFT_ORI_PEAK_RATIO); False keeps only the dominant
    # orientation (faster, slightly fewer descriptors).
    multi_orientation: bool = True
    # candidate-axis chunk sizes for the refinement/orientation/descriptor
    # patch pipelines (memory vs sequential-step trade-off; all three run
    # valid-sorted flattened queues with a runtime all-invalid chunk skip)
    ori_chunk: int = 256
    desc_chunk: int = 64
    refine_chunk: int = 512
    # Descriptor-stage backend: "pallas" fuses window gather + histogram
    # into one kernel (ops/pallas/sift_window.py), "xla" is the reference
    # vmapped path, "auto" picks pallas on accelerators and xla on CPU.
    patch_backend: str = "auto"
    pallas_chunk: int = 1024

    def __post_init__(self):
        if max(self.desc_radius_classes) > self.desc_patch_radius:
            raise ValueError(
                "desc_radius_classes must fit inside desc_patch_radius "
                "(the atlas padding)"
            )
        if max(self.ori_radius_classes) > self.desc_patch_radius:
            raise ValueError(
                "ori_radius_classes must fit inside desc_patch_radius "
                "(the atlas padding)"
            )
        # The converse bound: radius_class() clamps out-of-range scales to
        # the LAST class, so a largest class smaller than the worst-case
        # patch radius would silently truncate max-scale patches and
        # diverge from OpenCV instead of erroring (the documented "last
        # entry must equal the pad" invariant; ADVICE r2).
        if max(self.ori_radius_classes) < self.ori_patch_radius:
            raise ValueError(
                f"max(ori_radius_classes)={max(self.ori_radius_classes)} "
                f"must cover ori_patch_radius={self.ori_patch_radius} "
                "(max-scale keypoints clamp to the last class)"
            )
        if max(self.desc_radius_classes) < self.desc_patch_radius:
            raise ValueError(
                f"max(desc_radius_classes)={max(self.desc_radius_classes)} "
                f"must cover desc_patch_radius={self.desc_patch_radius} "
                "(max-scale keypoints clamp to the last class)"
            )

    @property
    def base_size(self) -> int:
        return self.process_size * 2 if self.upscale else self.process_size

    @property
    def n_octaves(self) -> int:
        # smallest octave kept at >= 16 px
        return max(1, int(math.log2(self.base_size)) - 3)

    def octave_budget(self, o: int) -> int:
        # geometric decay; octave 0 carries the full budget so the summed
        # candidate pool always covers max_keypoints
        return max(16, self.max_keypoints >> o)


# ---------------------------------------------------------------------------
# Pyramid
# ---------------------------------------------------------------------------
def _pyramid_sigmas(cfg: SiftConfig) -> list[float]:
    """Per-level *incremental* blur sigmas within an octave (OpenCV)."""
    k = 2.0 ** (1.0 / cfg.n_octave_layers)
    sig = [cfg.sigma]
    for i in range(1, cfg.n_octave_layers + 3):
        sig_prev = cfg.sigma * k ** (i - 1)
        sig_total = sig_prev * k
        sig.append(math.sqrt(sig_total**2 - sig_prev**2))
    return sig


def _build_pyramids(base: jnp.ndarray, cfg: SiftConfig):
    """base: (B, S, S) float 0..255 already blurred to cfg.sigma.

    Returns per-octave lists: gauss[o] (B, L+3, H, W), dog[o] (B, L+2, H, W).
    """
    sigs = _pyramid_sigmas(cfg)
    gauss_octaves = []
    dog_octaves = []
    current = base
    for o in range(cfg.n_octaves):
        levels = [current]
        for i in range(1, cfg.n_octave_layers + 3):
            levels.append(gaussian_blur_batch(levels[-1], sigs[i]))
        g = jnp.stack(levels, axis=1)  # (B, L+3, H, W)
        gauss_octaves.append(g)
        dog_octaves.append(g[:, 1:] - g[:, :-1])  # (B, L+2, H, W)
        # next octave base: level n_octave_layers downsampled 2x (OpenCV
        # uses nearest-neighbor resize here)
        current = levels[cfg.n_octave_layers][:, ::2, ::2]
    return gauss_octaves, dog_octaves


# ---------------------------------------------------------------------------
# Extrema detection + subpixel refinement
# ---------------------------------------------------------------------------
def _extrema_mask(dog: jnp.ndarray, prelim_thresh: float) -> jnp.ndarray:
    """dog: (L+2, H, W) -> bool (L, H, W) for layers 1..L (3x3x3 extrema).

    One 3x3x3 max/min ``reduce_window`` pass each: ``center == window_max``
    is exactly "center >= all 26 neighbors" (ties allowed, like OpenCV's
    ``>=``). The previous formulation stacked 26 rolled copies of the DoG
    (~2.6 GB materialized per 1024² octave batch) — pure HBM waste.

    Runs in bfloat16: the window comparisons see identically-quantized
    values on both sides, and the prelim threshold is an integer >= 1
    (DoG resolution at that magnitude is ~0.03) — candidate *selection*
    may flip on exact float ties, but every survivor is re-derived and
    gated in float32 by the refinement stage. OpenCV itself detects on an
    8-bit (1/48-step) pyramid — far coarser than this.
    """
    d = dog.astype(jnp.bfloat16)
    center = d[1:-1]  # (L, H, W)
    wmax = jax.lax.reduce_window(
        d, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "VALID"
    )  # (L, H-2, W-2), aligned with center[:, 1:-1, 1:-1]
    wmin = jax.lax.reduce_window(
        d, jnp.inf, jax.lax.min, (3, 3, 3), (1, 1, 1), "VALID"
    )
    wmax = jnp.pad(wmax, ((0, 0), (1, 1), (1, 1)), constant_values=jnp.inf)
    wmin = jnp.pad(wmin, ((0, 0), (1, 1), (1, 1)), constant_values=-jnp.inf)
    is_max = (center >= wmax) & (center > 0)
    is_min = (center <= wmin) & (center < 0)
    mask = (jnp.abs(center) > prelim_thresh) & (is_max | is_min)
    # kill the 5px border (OpenCV SIFT_IMG_BORDER)
    h, w = mask.shape[1:]
    rr = jnp.arange(h)[:, None]
    cc = jnp.arange(w)[None, :]
    border = (rr >= 5) & (rr < h - 5) & (cc >= 5) & (cc < w - 5)
    return mask & border[None, :, :]


def _fold_dog(dog, cfg: SiftConfig):
    """Row-fold one image's padded DoG to (H8, L+2, W*8) for the
    refinement patch gather: element [h8, l, w*8 + s] = padded
    dog[l, 8*h8 + s, w] (zero pad of reach+1 on each side; rows padded up
    to a multiple of 8 plus one spare chunk so bottom-row patches stay in
    bounds).

    The minor two dims swap (8, W) -> (W, 8) cheaply (the same relayout
    the orientation/descriptor atlas uses; a LANE-minor layer fold was
    measured 4x slower — its build transposes through a 5-element minor
    dim). The h8 axis leads so the batched fold flattens to
    (B*H8, L+2, W*8) rows for the Pallas refine kernel: candidate row
    starts land on an untiled dim, the full L+2 layer axis satisfies the
    equal-dim rule, and ONE DMA covers a candidate's whole scale cube.
    """
    reach = cfg.refine_reach
    n_total = dog.shape[0]
    h = dog.shape[1]
    rows_pad = -(-(h + 2 * (reach + 1)) // 8) * 8 + 8
    # layer pad to a multiple of 8: the layer axis sits second-minor in
    # the fold, and Mosaic folds a sub-tile dim into the f32 (8, 128)
    # sublane packing, making full-dim DMA slices unexpressible (the
    # same pitfall as the atlas's dummy dim; zero layers are inert —
    # the cube-select one-hots never address them).
    # right col pad 28: the Pallas gather reads 16-col-aligned 32-col
    # windows, which reach up to 31 cols past a right-edge candidate.
    lpad = (-n_total) % 8
    # Right col pad must cover the Pallas refine window: the DMA reads
    # lw/8 cols from a 16-col-aligned start at or before the candidate,
    # so a right-edge candidate can reach lw/8 - 1 cols past itself —
    # reach+1+24 alone under-covers that for refine_reach >= 7 (48-col
    # windows) and for octave widths where the aligned start lands on
    # the candidate column.
    side = 2 * reach + 3
    lw_cols = (-(-(side + 16) * 8 // 128) * 128) // 8
    rpad = max(reach + 1 + 24, lw_cols - 1)
    dogp = jnp.pad(dog, ((0, lpad), (reach + 1, rows_pad - h - reach - 1),
                         (reach + 1, rpad)))
    n_total = n_total + lpad
    wp = dogp.shape[2]
    dogp = dogp.astype(jnp.dtype(cfg.refine_dtype))
    folded = dogp.reshape(n_total, rows_pad // 8, 8, wp)
    folded = jnp.transpose(folded, (1, 0, 3, 2))
    return folded.reshape(rows_pad // 8, n_total, wp * 8)


def _gather_refine_patches(folded, img, cand_r, cand_c, cfg: SiftConfig):
    """(N, nq, L+2, side, 8) row-folded local DoG patches (nq =
    (side+14)//8 h8-chunks cover side rows at any residual) around integer
    candidates of a BATCHED folded DoG (B, H8, L+2, W*8), plus the
    per-candidate row residual s0.

    The patch gather is segment-latency-bound (thousands of vmapped
    dynamic slices paying per contiguous run); on the folded layout an
    arbitrary-row patch is a (nq, L+2, side*8) slice — nq contiguous runs
    per layer instead of one short (col, layer) run per patch ROW. The
    old patch row ``i`` lives at ``[q0, .., .., s]`` via
    ``i = 8*q0 + s - s0`` with ``s0 = r % 8``; the refinement's one-hot
    cube selects absorb s0 for free (``_refine_candidates``).
    ``patch[n, q0, l, j, s] = dog[img_n, l, 8*(r_n//8 + q0) + s - reach
    - 1, c_n - reach - 1 + j]`` (relative to the reach+1 zero pad).
    """
    reach = cfg.refine_reach
    side = 2 * reach + 3
    nq = (side + 14) // 8  # h8-chunks covering side rows at any residual
    n_total = folded.shape[2]

    def patch_one(im, r, c):
        blk = jax.lax.dynamic_slice(
            folded, (im, r // 8, 0, c * 8), (1, nq, n_total, side * 8))
        return blk.reshape(nq, n_total, side, 8)

    return jax.vmap(patch_one)(img, cand_r, cand_c), cand_r % 8


def _refine_candidates(folded, img, cand_layer, cand_r, cand_c, cand_valid,
                       h, w, cfg: SiftConfig):
    """Iterative quadratic subpixel refinement (OpenCV adjustLocalExtrema).

    folded: (B, L+2, H8, W*8) row-folded DoG of the whole batch at this
    octave (``_fold_dog``), values in 0..255 scale; ``img`` indexes it
    per candidate (the candidate queue is flattened across the batch so
    the caller can chunk-skip all-invalid spans). ``h``/``w`` are the
    octave's static dims. cand_layer in [1, L]. Returns tuple of
    per-candidate arrays: layer, r, c (ints), xr, xc, xi (offsets),
    contrast (normalized 0..1 scale), valid.

    TPU-first structure (round 2): the round-1 version re-gathered a 3x3x3
    cube per candidate per iteration (vmapped ``dynamic_slice``); gather
    latency made each of the 6 gather rounds cost ~8 ms/img. Instead:

    1. gather ONE local patch per candidate — the iteration moves at most
       ``refine_steps`` (=5) pixels, so every reachable cube lives inside;
    2. each iteration *selects* its 27-value cube with rank-1 one-hot
       contractions — MXU matmuls, no gathers inside the loop.
    """
    img_scale = 1.0 / 255.0
    deriv_scale = img_scale * 0.5
    second_deriv_scale = img_scale
    cross_deriv_scale = img_scale * 0.25
    n_layers = cfg.n_octave_layers
    n_total = folded.shape[2]  # L+2
    reach = cfg.refine_reach  # max pixels moved
    side = 2 * reach + 3  # patch side: interior +-reach, stencil halo +-1
    isz = side - 2  # stencil-evaluable interior side

    # 1) one local window per candidate. The Pallas backend gathers
    # 16-col-aligned 32-col windows with ONE DMA per candidate (8
    # in-flight per grid step; ops/pallas/sift_window.refine_gather_pass)
    # — the cube-select one-hots absorb the col residual ``jres`` exactly
    # like the row residual ``s0``; the math itself stays on the XLA
    # path, whose chunk-batched einsums keep the MXU utilization a
    # per-candidate in-kernel port would lose.
    use_pallas = cfg.patch_backend == "pallas" or (
        cfg.patch_backend == "auto" and jax.default_backend() != "cpu"
    )
    if use_pallas:
        from .pallas.sift_window import refine_gather_pass

        h8t = folded.shape[1]
        dog_flat = folded.reshape(-1, n_total, folded.shape[-1])
        col16 = (cand_c * 8) // 128 * 16
        jres = cand_c - col16
        s0 = cand_r % 8
        zi = jnp.zeros_like(cand_r)
        ints = jnp.stack(
            [img * h8t + cand_r // 8, zi, cand_valid.astype(jnp.int32),
             zi, zi, col16 * 8, zi, zi], axis=0)
        nq = (side + 14) // 8
        blk = refine_gather_pass(
            dog_flat, ints, n_layers=n_total, side=side, nq=nq,
            interpret=jax.default_backend() == "cpu")
        wcols = blk.shape[-1] // 8
        patches = blk.reshape(blk.shape[0], nq, n_total, wcols, 8)
    else:
        patches, s0 = _gather_refine_patches(
            folded, img, cand_r, cand_c, cfg)
        jres = jnp.zeros_like(cand_c)
        wcols = side

    # 2) per-iteration 3x3x3 cube select via rank-1 one-hot contractions.
    # An earlier cut precomputed all 10 derivative stencils densely over
    # the patch interior and one-hot-selected 10 scalars per iteration —
    # but the dense maps are 10x3x11x11 f32 per candidate and the select
    # re-reads them every iteration: ~87 KB of HBM traffic per candidate.
    # Round 3: the row residual s0 (and on the Pallas path the col
    # residual jres of the 16-col-aligned window) is the SAME for every
    # iteration, so absorb both ONCE into a compact (N, side, L+2, side)
    # patch; each of the 6 cube selects then reads ~1.6 KB instead of the
    # full ~10 KB folded window (~7x less traffic and select compute).
    n_cand = patches.shape[0]
    center = reach  # local spatial index of the starting pixel in interior
    tri = jnp.arange(3, dtype=jnp.int32)

    ii = jnp.arange(side, dtype=jnp.int32)
    q16 = s0[:, None] + ii  # (N, side) folded row ids of patch rows
    rq = jax.nn.one_hot(q16 // 8, patches.shape[1], dtype=patches.dtype)
    rs8 = jax.nn.one_hot(q16 % 8, 8, dtype=patches.dtype)
    t = jnp.einsum(
        "nis,nqljs->niqlj", rs8, patches, preferred_element_type=jnp.float32
    )
    compact = jnp.einsum(
        "niq,niqlj->nlij", rq, t, preferred_element_type=jnp.float32
    )  # (N, L+2, side, wcols): patch row i = folded row s0+i
    if use_pallas:
        chc = jax.nn.one_hot(jres[:, None] + ii, wcols, dtype=patches.dtype)
        compact = jnp.einsum(
            "nkj,nlij->nlik", chc, compact, preferred_element_type=jnp.float32
        )  # (N, L+2, side, side): patch col k = window col jres+k
    # else: jres == 0 and wcols == side — compact is already aligned.
    # Layer-major with the spatial plane flattened: ONE fused (row, col)
    # one-hot then selects a 3x3 block per layer in a single contraction.
    compact_sp = compact.reshape(n_cand, n_total, side * side)

    # The 10 refinement stencils (value + 3 first / 3 second / 3 cross
    # derivatives, image scales folded in) are fixed linear maps of the 27
    # cube values: one constant (27, 10) matmul replaces the ~30 tiny (N,)
    # slice/arithmetic ops of the per-stencil formulation (each a separate
    # vector op; issue overhead dominated). Flat cube index is
    # (a * 3 + b) * 3 + d for row/col/layer offsets a, b, d in 0..2.
    w_st = np.zeros((27, 10), np.float32)

    def _at(d_off, a_off, b_off):
        return (a_off * 3 + b_off) * 3 + d_off

    w_st[_at(1, 1, 1), 0] = img_scale                                 # value
    for j, (pp, pm) in ((1, ((1, 1, 2), (1, 1, 0))),                  # dDx
                        (2, ((1, 2, 1), (1, 0, 1))),                  # dDy
                        (3, ((2, 1, 1), (0, 1, 1)))):                 # dDs
        w_st[_at(*pp), j] = deriv_scale
        w_st[_at(*pm), j] = -deriv_scale
    for j, (pp, pm) in ((4, ((1, 1, 2), (1, 1, 0))),                  # dxx
                        (5, ((1, 2, 1), (1, 0, 1))),                  # dyy
                        (6, ((2, 1, 1), (0, 1, 1)))):                 # dss
        w_st[_at(*pp), j] += second_deriv_scale
        w_st[_at(*pm), j] += second_deriv_scale
        w_st[_at(1, 1, 1), j] -= 2.0 * second_deriv_scale
    for j, quad in ((7, ((1, 2, 2), (1, 2, 0), (1, 0, 2), (1, 0, 0))),  # dxy
                    (8, ((2, 1, 2), (2, 1, 0), (0, 1, 2), (0, 1, 0))),  # dxs
                    (9, ((2, 2, 1), (2, 0, 1), (0, 2, 1), (0, 0, 1)))):  # dys
        for sgn, pos in zip((1.0, -1.0, -1.0, 1.0), quad):
            w_st[_at(*pos), j] += sgn * cross_deriv_scale
    w_st = jnp.asarray(w_st)

    def select(layer, dr, dc):
        """10 stencil scalars at local interior position (layer, dr, dc).

        Interior (dr, dc) sits at patch row/col dr+1/dc+1; its 3x3
        spatial block spans compact patch rows dr..dr+2 / cols dc..dc+2
        (residuals pre-absorbed above), and the scale cube spans patch
        layers layer-1..layer+1. A fused (9, side*side) spatial one-hot
        and the layer one-hot pick the 3x3x3 cube in two contractions;
        the constant stencil matrix maps it to the 10 scalars."""
        ra = dr[:, None] + tri
        ca = dc[:, None] + tri
        idx = (ra[:, :, None] * side + ca[:, None, :]).reshape(n_cand, 9)
        sp = jax.nn.one_hot(idx, side * side, dtype=compact_sp.dtype)
        lh = jax.nn.one_hot(layer[:, None] - 1 + tri, n_total)  # (N, 3, L+2)
        p_sel = jnp.einsum(
            "naq,nlq->nal", sp, compact_sp, preferred_element_type=jnp.float32
        )  # (N, 9, L+2): the 3x3 spatial block per layer, (a*3+b) rows
        cube = jnp.einsum(
            "nal,ndl->nad", p_sel, lh, preferred_element_type=jnp.float32
        )  # (N, 9, 3): cube[(dr+a, dc+b), layer-1+d] with d minor
        return cube.reshape(n_cand, 27) @ w_st  # (N, 10)

    def solve3(s):
        """Closed-form symmetric 3x3 solve H X = dD (adjugate/Cramer).
        jnp.linalg.solve's pivoted LU, vmapped over thousands of
        candidates, dominated the whole round-1 SIFT pipeline. Singular H
        blows the offsets up and the candidate dies on the |x|>1e6 check,
        matching the solve+reject behavior."""
        dDx, dDy, dDs = s[:, 1], s[:, 2], s[:, 3]
        a, d_, f_ = s[:, 4], s[:, 5], s[:, 6]
        b_, c_, e_ = s[:, 7], s[:, 8], s[:, 9]
        co00 = d_ * f_ - e_ * e_
        co01 = c_ * e_ - b_ * f_
        co02 = b_ * e_ - c_ * d_
        co11 = a * f_ - c_ * c_
        co12 = b_ * c_ - a * e_
        co22 = a * d_ - b_ * b_
        det = a * co00 + b_ * co01 + c_ * co02
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        x0 = (co00 * dDx + co01 * dDy + co02 * dDs) * inv_det
        x1 = (co01 * dDx + co11 * dDy + co12 * dDs) * inv_det
        x2 = (co02 * dDx + co12 * dDy + co22 * dDs) * inv_det
        return -x0, -x1, -x2  # xc, xr, xi

    zeros_f = jnp.zeros((n_cand,), jnp.float32)

    def body(_, state):
        layer, dr, dc, xr, xc, xi, ok, converged = state
        s = select(layer, dr, dc)
        xc_n, xr_n, xi_n = solve3(s)

        done = (
            (jnp.abs(xc_n) < 0.5) & (jnp.abs(xr_n) < 0.5) & (jnp.abs(xi_n) < 0.5)
        )
        big = (
            (jnp.abs(xc_n) > 1e6) | (jnp.abs(xr_n) > 1e6) | (jnp.abs(xi_n) > 1e6)
        )
        freeze = converged | done
        step_c = jnp.where(freeze, 0, jnp.round(xc_n).astype(jnp.int32))
        step_r = jnp.where(freeze, 0, jnp.round(xr_n).astype(jnp.int32))
        step_l = jnp.where(freeze, 0, jnp.round(xi_n).astype(jnp.int32))
        new_dc = dc + step_c
        new_dr = dr + step_r
        new_l = layer + step_l
        gr = cand_r + new_dr - center  # absolute image coords
        gc = cand_c + new_dc - center
        inb = (
            (new_l >= 1)
            & (new_l <= n_layers)
            & (gr >= 5)
            & (gr < h - 5)
            & (gc >= 5)
            & (gc < w - 5)
        )
        # Rounds can step >1 px; anything escaping the +-reach local window
        # is an unstable extremum — reject rather than chase it (the old
        # global-coordinate code would keep iterating; such candidates
        # essentially never survive the contrast/edge gates anyway).
        in_window = (
            (new_dr >= 0) & (new_dr <= isz - 1)
            & (new_dc >= 0) & (new_dc <= isz - 1)
        )
        ok = ok & inb & ~big & in_window
        xr = jnp.where(converged, xr, xr_n)
        xc = jnp.where(converged, xc, xc_n)
        xi = jnp.where(converged, xi, xi_n)
        return (
            jnp.clip(new_l, 1, n_layers),
            jnp.clip(new_dr, 0, isz - 1),
            jnp.clip(new_dc, 0, isz - 1),
            xr,
            xc,
            xi,
            ok,
            converged | done,
        )

    state = (
        cand_layer,
        jnp.full((n_cand,), center, jnp.int32),
        jnp.full((n_cand,), center, jnp.int32),
        zeros_f,
        zeros_f,
        zeros_f,
        cand_valid,
        jnp.zeros((n_cand,), bool),
    )
    layer, dr, dc, xr, xc, xi, ok, converged = jax.lax.fori_loop(
        0, cfg.refine_steps, body, state
    )
    ok = ok & converged

    # final contrast + edge checks at the converged location
    s = select(layer, dr, dc)
    val, dDx, dDy = s[:, 0], s[:, 1], s[:, 2]
    dDs, dxx, dyy, dxy = s[:, 3], s[:, 4], s[:, 5], s[:, 7]
    contr = val + 0.5 * (dDx * xc + dDy * xr + dDs * xi)
    ok = ok & (jnp.abs(contr) * n_layers >= cfg.contrast_threshold)
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    e = cfg.edge_threshold
    ok = ok & (det > 0) & (tr * tr * e < (e + 1) * (e + 1) * det)

    r_out = cand_r + dr - center
    c_out = cand_c + dc - center
    return layer, r_out, c_out, xr, xc, xi, contr, ok


# ---------------------------------------------------------------------------
# Orientation
# ---------------------------------------------------------------------------
def _magang_stacks(gauss: jnp.ndarray, pad: int, dtype=jnp.float32):
    """Dense per-octave gradient magnitude/angle stacks, zero-padded by
    ``pad`` on H/W, channel-PLANAR: (L, 2, H+2p, W+2p).

    OpenCV convention: dx = I[r, c+1] - I[r, c-1]; dy = I[r-1, c] - I[r+1, c]
    (y-up); angle = atan2(dy, dx). Computed densely ONCE per octave pixel;
    per-candidate windows are then contiguous dynamic slices of the
    row-folded atlas (see ``_grad_atlas``).
    """
    # Candidates only ever live on layers 1..L (refinement clips there), so
    # levels 0 and L+1..L+2 never feed a patch: build mag/ang for the L
    # addressable levels only. Callers index with ``layer - 1``.
    g = gauss[1:-2]
    dx = jnp.pad(g[:, :, 2:] - g[:, :, :-2], ((0, 0), (0, 0), (1, 1)))
    dy = jnp.pad(g[:, :-2, :] - g[:, 2:, :], ((0, 0), (1, 1), (0, 0)))
    mag = jnp.sqrt(dx * dx + dy * dy)
    # Zero the 1-pixel border ring: OpenCV's per-pixel validity check
    # (r, c within [1, dim-2]) excludes exactly these rows/cols, but the
    # ring's mag is NOT naturally zero (at r=0 dy=0 yet dx can be
    # nonzero). With the ring zeroed here (once per dense stack), every
    # window consumer's image-bound mask becomes redundant — excluded
    # pixels contribute exact 0 through the magnitude factor — which
    # lets the Pallas window kernels drop their per-candidate rr/cc
    # mask chain (~9 window-wide VPU ops/candidate) bit-identically.
    # The XLA paths keep their inb masks (they are the OpenCV-parity
    # reference); for them this is a no-op by construction.
    mag = mag.at[:, 0, :].set(0.0).at[:, -1, :].set(0.0)
    mag = mag.at[:, :, 0].set(0.0).at[:, :, -1].set(0.0)
    ang = jnp.arctan2(dy, dx)
    widths = ((0, 0), (0, 0), (pad, pad), (pad, pad))
    # bf16 atlas storage halves HBM traffic of the per-candidate slices;
    # angle resolution ~0.012 rad is far inside the 36-bin histogram width.
    return jnp.pad(jnp.stack([mag, ang], axis=1).astype(dtype), widths)


def _window_rows(radius: int) -> int:
    """h8-chunks a (2R+1)-row window can span at any row residual 0..7."""
    return (2 * radius + 1 + 6) // 8 + 1


def _magang_window(atlas, layer, r, c, radius: int, h, w, pad: int, row_off=0,
                   img=None):
    """Mag/angle window around (r, c) at ``layer`` from the row-folded
    atlas, plus per-pixel (ii, jj) keypoint-relative offsets and the
    OpenCV border-validity mask (r, c within [1, dim-2]).

    The atlas folds each 8-row chunk into the minor axis (see
    ``_grad_atlas``): (..., H8, W*8) with element [h8, w*8 + s] =
    stack[8*h8 + s, w]. A (2R+1)-row window starting at an arbitrary row
    is then ONE (nh8, P*8) slice — 2 contiguous ~P*8-element runs per
    h8-chunk instead of one short run per patch ROW, which is what makes
    the per-candidate gather segment-count (the measured round-2 bound)
    collapse. The row residual s0 = start % 8 is not extracted; the
    returned (ii, jj) offsets and masks absorb it (all consumers are
    mask-driven), at the cost of processing nh8*8 rows (= P+7..P+14
    instead of P — a ~1.1-1.3x pixel overcount that the dense VPU math
    shrugs off).

    Returns FLAT (n_pix,) = (nh8 * P * 8,) vectors: mag, ang in atlas
    dtype, ii, jj float32 offsets from the keypoint, inb bool mask.
    ``img`` addresses a batched (B, L, H8, 2, W*8) atlas.
    """
    p = 2 * radius + 1
    nh8 = _window_rows(radius)
    gr = r + pad + row_off  # global atlas row of the keypoint
    rs = gr - radius
    h8s = rs // 8
    s0 = rs - 8 * h8s
    ws = c - radius + pad
    if img is None:
        start = (layer - 1, h8s, 0, ws * 8)
        blk = jax.lax.dynamic_slice(atlas, start, (1, nh8, 2, p * 8))
        blk = blk[0]
    else:
        start = (img, layer - 1, h8s, 0, ws * 8)
        blk = jax.lax.dynamic_slice(atlas, start, (1, 1, nh8, 2, p * 8))
        blk = blk[0, 0]
    # FLAT (n_pix,) pixel vectors: vmapping over the candidate chunk then
    # yields dense (chunk, n_pix) arrays — pixel math rides full 128-lane
    # rows. (Keeping the (nh8, p, 8) window shape puts the 8-subrow axis
    # minor: 8/128 lane utilization on every elementwise op — measured to
    # cancel the fold's entire gather win.)
    mag = blk[:, 0, :].reshape(nh8 * p * 8)
    ang = blk[:, 1, :].reshape(nh8 * p * 8)
    # pixel idx = (i0, i1, i2) -> atlas row 8*(h8s+i0)+i2, col ws+i1;
    # the offset grids are trace-time constants (numpy), only s0 varies.
    idx = np.arange(nh8 * p * 8)
    i0 = idx // (p * 8)
    i1 = (idx // 8) % p
    i2 = idx % 8
    ii_base = jnp.asarray((8 * i0 + i2 - radius).astype(np.float32))
    jj = jnp.asarray((i1 - radius).astype(np.float32))
    ii = ii_base - s0.astype(jnp.float32)
    rr = r + ii
    cc = c + jj
    inb = (
        (ii >= -radius) & (ii <= radius)
        & (rr >= 1) & (rr < h - 1) & (cc >= 1) & (cc < w - 1)
    )
    return mag, ang, ii, jj, inb


def _orientation(stacks, h, w, pad, layer, r, c, scl_oct, valid, cfg: SiftConfig,
                 row_off=0, radius: int | None = None, img=None):
    """Dominant gradient orientation (radians, OpenCV's grad-angle
    convention θ = atan2(dy, dx) with y-up dy). Histogram built as a dense
    (P², 36) one-hot-mix matmul (bf16 inputs, f32 accumulate); smoothing is
    OpenCV's [1,4,6,4,1]/16 circular kernel; the peak is parabolically
    interpolated. ``radius`` is the static patch radius for this pass (a
    scale class may use less than the worst-case cfg.ori_patch_radius)."""
    radius_f = jnp.round(4.5 * scl_oct)  # SIFT_ORI_RADIUS = 3 * 1.5
    sigma_w = 1.5 * scl_oct
    exp_scale = -1.0 / (2.0 * sigma_w * sigma_w)
    R = cfg.ori_patch_radius if radius is None else radius

    mag, ang, ii, jj, inb = _magang_window(
        stacks, layer, r, c, R, h, w, pad, row_off, img)
    in_radius = (jnp.abs(ii) <= radius_f) & (jnp.abs(jj) <= radius_f)
    wmask = (inb & in_radius).astype(jnp.float32)
    wgt = jnp.exp((ii * ii + jj * jj) * exp_scale) * wmask
    n_bins = 36
    fbin = ang.astype(jnp.float32) * (n_bins / (2.0 * jnp.pi))
    bin_idx = jnp.round(fbin).astype(jnp.int32) % n_bins  # OpenCV cvRound
    # Transposed (36, n_pix) one-hot: the pixel axis stays minor/dense
    # (full 128-lane rows once vmapped over the candidate chunk), where a
    # (n_pix, 36) layout would run every row at 36/128 lane utilization.
    # VPU multiply+reduce rather than an M=1 MXU matmul (frees the MXU;
    # measured equal-or-better, docs/PERF.md round 3).
    k36 = jnp.arange(n_bins, dtype=jnp.int32)[:, None]
    wm = wgt * mag.astype(jnp.float32)
    hist = jnp.sum(
        (bin_idx[None, :] == k36).astype(jnp.float32) * wm[None, :], axis=1
    )

    # circular smoothing [1,4,6,4,1]/16
    def smooth(hh):
        return (
            (jnp.roll(hh, 2) + jnp.roll(hh, -2)) * (1.0 / 16.0)
            + (jnp.roll(hh, 1) + jnp.roll(hh, -1)) * (4.0 / 16.0)
            + hh * (6.0 / 16.0)
        )

    hist = smooth(hist)

    def peak_theta(peak):
        l_ = hist[(peak - 1) % n_bins]
        c_ = hist[peak]
        r_ = hist[(peak + 1) % n_bins]
        denom = l_ - 2.0 * c_ + r_
        interp = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (l_ - r_) / denom, 0.0)
        return (peak.astype(jnp.float32) + interp) * (2.0 * jnp.pi / n_bins)

    peak = jnp.argmax(hist)
    theta = jnp.where(valid, peak_theta(peak), 0.0)

    # strongest secondary local peak >= 0.8 * max (OpenCV SIFT_ORI_PEAK_RATIO
    # emits a duplicate keypoint per such peak; we keep the best one)
    left = jnp.roll(hist, 1)
    right = jnp.roll(hist, -1)
    omax = hist[peak]
    is_peak = (hist > left) & (hist >= right) & (hist >= 0.8 * omax)
    is_peak = is_peak & (jnp.arange(n_bins) != peak)
    second = jnp.argmax(jnp.where(is_peak, hist, -jnp.inf))
    has_second = jnp.any(is_peak) & valid
    theta2 = jnp.where(has_second, peak_theta(second), 0.0)
    return theta, theta2, has_second


# ---------------------------------------------------------------------------
# Descriptor
# ---------------------------------------------------------------------------
def _descriptor(stacks, h, w, pad, layer, r, c, scl_oct, theta, valid,
                cfg: SiftConfig, row_off=0, radius: int | None = None,
                img=None):
    """128-D descriptor, OpenCV calcSIFTDescriptor semantics, built as a
    dense einsum over rank-1 trilinear weight products (no scatter; bf16
    MXU inputs with f32 accumulation). ``radius`` is this pass's static
    patch radius (scale classes use less than the worst-case maximum)."""
    d, n = 4, 8
    hist_width = 3.0 * scl_oct
    cos_t = jnp.cos(theta) / hist_width
    sin_t = jnp.sin(theta) / hist_width
    bins_per_rad = n / (2.0 * jnp.pi)
    exp_scale = -1.0 / (d * d * 0.5)
    radius_f = jnp.round(hist_width * 1.4142135623730951 * (d + 1) * 0.5)
    R = cfg.desc_patch_radius if radius is None else radius

    mag_p, ang, ii, jj, inb = _magang_window(
        stacks, layer, r, c, R, h, w, pad, row_off, img)
    cdt = mag_p.dtype
    ang = ang.astype(jnp.float32)
    mag_p = mag_p.astype(jnp.float32)
    in_radius = (jnp.abs(ii) <= radius_f) & (jnp.abs(jj) <= radius_f)

    c_rot = jj * cos_t - ii * sin_t
    r_rot = jj * sin_t + ii * cos_t
    rbin = r_rot + d / 2 - 0.5
    cbin = c_rot + d / 2 - 0.5
    ok = (
        in_radius
        & inb
        & (rbin > -1.0)
        & (rbin < d)
        & (cbin > -1.0)
        & (cbin < d)
    )

    obin = (ang - theta) * bins_per_rad  # relative orientation bins
    w = jnp.exp((c_rot * c_rot + r_rot * r_rot) * exp_scale)
    mag = mag_p * w * ok.astype(mag_p.dtype)

    # Trilinear weights as HAT functions in TRANSPOSED (bins, n_pix)
    # layout: wr[k, p] = max(0, 1 - |rbin_p + 1 - k|) puts weight 1-frac /
    # frac on exactly the two adjacent bins — identical to the previous
    # one-hot linear mixes — while keeping the pixel axis minor, so every
    # build op runs dense 128-lane rows once vmapped over the candidate
    # chunk (the (n_pix, 6)-layout one-hots ran at 6/128 utilization and
    # dominated the stage). Orientation uses pos = o0 + frac with o0 the
    # int-wrapped floor (OpenCV's decomposition), bins 0..9 with the
    # circular border folded below.
    # obin mod 8 as a pure-float wrap — equivalent to the int-cast
    # floor/mod/mod decomposition within 1 ulp (this form rounds once
    # where the old chain rounded twice; ~0.2% of f32 inputs differ by
    # 1 ulp, which vanishes under the descriptor's integer rounding; see
    # the kernel twin in ops/pallas/sift_window.py).
    pos_o = obin - float(n) * jnp.floor(obin * (1.0 / n))  # n = 8 = 2**3

    k36 = np.arange((d + 2) * (d + 2))
    rk = jnp.asarray((k36 // (d + 2)).astype(np.float32))[:, None]
    ck = jnp.asarray((k36 % (d + 2)).astype(np.float32))[:, None]
    ko = jnp.asarray(np.arange(n + 2, dtype=np.float32))[:, None]
    hat = lambda x: jnp.maximum(0.0, 1.0 - jnp.abs(x))  # noqa: E731
    wrc = hat(rbin[None, :] + 1.0 - rk) * hat(cbin[None, :] + 1.0 - ck)
    a = (wrc * mag[None, :]).astype(cdt)  # (36, n_pix)
    wo = hat(pos_o[None, :] - ko).astype(cdt)  # (10, n_pix)

    # hist[r, c, o] = sum_p mag_p * wr[p, r] * wc[p, c] * wo[p, o], as ONE
    # lane-contracted (36, P) x (10, P) matmul per candidate (bf16 MXU
    # inputs, f32 accumulation): both operands keep the pixel axis minor,
    # so neither needs a relayout before the MXU.
    hist = jax.lax.dot_general(
        a, wo, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).reshape(d + 2, d + 2, n + 2)

    # fold circular orientation borders, keep interior 4x4 spatial bins
    interior = hist[1 : d + 1, 1 : d + 1, :]
    folded = interior[:, :, :n].at[:, :, 0].add(interior[:, :, n])
    folded = folded.at[:, :, 1].add(interior[:, :, n + 1])
    vec = folded.reshape(d * d * n)

    # OpenCV normalization: clip at 0.2 * ||v||, rescale to 512, cap 255,
    # then ROUND to integers — OpenCV saturate_casts each element to uchar
    # (calcSIFTDescriptor's final store), so integer-valued descriptors
    # are the reference behavior, and they make the uint8 host wire
    # format (sift_descriptors' multi-chunk fetch) lossless.
    nrm2 = jnp.sum(vec * vec)
    thr = jnp.sqrt(nrm2) * 0.2
    vec = jnp.minimum(vec, thr)
    nrm2 = jnp.sum(vec * vec)
    scale = 512.0 / jnp.maximum(jnp.sqrt(nrm2), 1e-12)
    vec = jnp.round(jnp.minimum(vec * scale, 255.0))
    return jnp.where(valid, vec, 0.0)


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------
def _chunked_vmap(fn, args, chunk: int, valid=None, batched: bool = False):
    """vmap ``fn`` over the leading axis, sequentially in chunks via
    ``lax.map`` — bounds the live memory of per-candidate patch pipelines
    (a full vmap would materialize every candidate's patches at once).
    ``fn`` may return an array or a pytree of arrays.

    ``valid``: optional (k,) bool; chunks with no valid rows short-circuit
    to zeros via ``lax.cond`` (a REAL runtime skip — this is a sequential
    map, not a vmap). The candidate budget is a worst-case bound and rows
    arrive response-sorted (valid first), so on typical photographs most
    trailing chunks skip and the orientation/descriptor cost tracks the
    actual keypoint count instead of the budget.

    ``batched``: ``fn`` already consumes (chunk,)-leading arrays (e.g. the
    refinement, written batch-style) — call it directly instead of
    vmapping a per-row function."""
    k = args[0].shape[0]
    if k % chunk != 0:
        chunk = math.gcd(k, chunk) or 1
    n_chunks = k // chunk
    call = fn if batched else (lambda *ch: jax.vmap(fn)(*ch))
    reshaped = tuple(a.reshape((n_chunks, chunk) + a.shape[1:]) for a in args)
    if valid is None:
        out = jax.lax.map(lambda ch: call(*ch), reshaped)
    else:
        v_chunks = valid.reshape(n_chunks, chunk)
        out_sd = jax.eval_shape(
            lambda ch: call(*ch), tuple(a[0] for a in reshaped)
        )

        def run(ch_v):
            ch, v = ch_v
            return jax.lax.cond(
                jnp.any(v),
                lambda: call(*ch),
                lambda: jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), out_sd
                ),
            )

        out = jax.lax.map(run, (reshaped, v_chunks))
    return jax.tree_util.tree_map(
        lambda a: a.reshape((k,) + a.shape[2:]), out
    )


def _rank_candidates(dog_o, budget: int, cfg: SiftConfig):
    """Extrema mask + bf16 scoring + hierarchical top-k over one octave
    (the pre-refinement detection prefix; shared with the stage profiler).

    dog_o (L+2, H, W) -> (vals, layer, r, c, valid), each (<=budget,).
    """
    prelim = math.floor(0.5 * cfg.contrast_threshold / cfg.n_octave_layers * 255)
    mask = _extrema_mask(dog_o, float(max(prelim, 1)))  # (L, H, W)
    # bf16 scoring halves the top-k bandwidth; ranking ties among
    # same-quantized weak candidates are refinement-gated anyway
    score = jnp.abs(dog_o[1:-1].astype(jnp.bfloat16)) * mask
    n_l, n_h, n_w = score.shape
    # Hierarchical candidate selection: a flat top_k over the whole octave
    # (3.1M elements at 1024²) is a large sort; instead take the top-8
    # per (layer, row) — 3x3x3 extrema are >= 2 px apart, so 8 per 1024-px
    # row drops only pathological rows, and those by weakest-first — then
    # rank the ~L*H*8 survivors globally. The global budget is clamped to
    # the surviving pool (a large max_keypoints at a small process_size
    # would otherwise ask top_k for more rows than exist).
    per_row = min(8, n_w)
    budget = min(budget, n_l * n_h * per_row)
    row_vals, row_idx = jax.lax.top_k(score.reshape(n_l * n_h, n_w), per_row)
    vals, ii = jax.lax.top_k(row_vals.reshape(-1), budget)
    row = ii // per_row
    l_, r_ = jnp.divmod(row, n_h)
    c_ = row_idx.reshape(-1)[ii]
    valid = vals > 0
    layer = (l_ + 1).astype(jnp.int32)
    return vals, layer, r_.astype(jnp.int32), c_.astype(jnp.int32), valid


def _detect_octave(dog_o_batch, budget, cfg: SiftConfig):
    """Whole-batch octave detection (no orientation/descriptors here).
    dog_o_batch (B, L+2, H, W) -> dict of (B, budget) per-candidate
    arrays.

    The refinement runs over a FLATTENED batch x candidate queue sorted
    valid-first and chunked with a runtime all-invalid skip
    (``_chunked_vmap``), the same structure as the orientation and
    descriptor passes: the per-octave budget is a worst-case bound
    (octave 0 carries max_keypoints rows) while real extrema counts are
    usually far smaller, so per-image batched refinement paid the budget
    where this pays the actual candidate count."""
    b_sz = dog_o_batch.shape[0]
    h, w = dog_o_batch.shape[2], dog_o_batch.shape[3]
    vals, layer, r_, c_, valid = jax.vmap(
        lambda d: _rank_candidates(d, budget, cfg)
    )(dog_o_batch)
    folded = jax.vmap(lambda d: _fold_dog(d, cfg))(dog_o_batch)

    k = valid.shape[1]
    flat_img = jnp.repeat(jnp.arange(b_sz, dtype=jnp.int32), k)
    flat = (layer.reshape(-1), r_.reshape(-1), c_.reshape(-1),
            valid.reshape(-1))
    # valid-first stable sort; _rank_candidates emits rows response-sorted
    # per image, so valid rows of every image pack to the front
    order = jnp.argsort(jnp.where(flat[3], 0, 1).astype(jnp.int32),
                        stable=True)
    inv = jnp.argsort(order)
    s_img = flat_img[order]
    s_layer, s_r, s_c, s_valid = (a[order] for a in flat)

    refined = _chunked_vmap(
        lambda im, l, rr, cc, v: _refine_candidates(
            folded, im, l, rr, cc, v, h, w, cfg),
        (s_img, s_layer, s_r, s_c, s_valid),
        chunk=min(cfg.refine_chunk, b_sz * k),
        valid=s_valid,
        batched=True,
    )
    layer, r, c, xr, xc, xi, contr, ok = (
        a[inv].reshape(b_sz, k) for a in refined)
    scl_oct = cfg.sigma * 2.0 ** ((layer.astype(jnp.float32) + xi) / cfg.n_octave_layers)
    return {
        "layer": layer,
        "r": r,
        "c": c,
        "xr": xr,
        "xc": xc,
        "xi": xi,
        "scl_oct": scl_oct,
        "response": jnp.where(ok, jnp.abs(contr), -1.0),
        "valid": ok,
    }


def _atlas_layout(cfg: SiftConfig):
    """Static (row_offsets, heights, widths) of the cross-octave atlas.
    Each octave's padded region height is rounded up to a multiple of 8 so
    the row-folded layout (``_grad_atlas``) keeps every octave's rows
    chunk-aligned (offsets stay multiples of 8)."""
    pad = cfg.desc_patch_radius
    offsets, heights, widths = [], [], []
    off = 0
    for o in range(cfg.n_octaves):
        h = w = cfg.base_size >> o
        offsets.append(off)
        heights.append(h)
        widths.append(w)
        off += -(-(h + 2 * pad) // 8) * 8
    return np.asarray(offsets), np.asarray(heights), np.asarray(widths)


def _grad_atlas(gauss_octaves, cfg: SiftConfig):
    """Cross-octave ROW-FOLDED mag/angle atlas: (L, H8, 2, W_max*8) with
    element [l, h8, ch, w*8 + s] = stacks[l, ch, 8*h8 + s, w] and every
    octave's padded region concatenated along the h8 axis.

    The fold makes an arbitrary-row-start (2R+1)-col window ONE
    (nh8, (2R+1)*8) dynamic slice whose contiguous runs are whole
    (2R+1)*8-element chunks — the per-candidate gather is
    segment-latency-bound (round-2 measurement), and this layout cuts the
    segment count per window from one-per-patch-row (e.g. 81) to
    one-per-8-rows (e.g. 11). Consumers absorb the row residual via masks
    (``_magang_window``). Two zero h8-chunks pad the bottom so max-radius
    windows of bottom-row keypoints of the last octave stay in bounds."""
    pad = cfg.desc_patch_radius
    # +32 cols: the Pallas window kernel aligns lane starts down to
    # 16-col boundaries and rounds its slice width up to full 128-lane
    # tiles, so a right-edge window may read up to 31 cols past
    # w + 2*pad (zeros, mask-excluded)
    w_max = gauss_octaves[0].shape[-1] + 2 * pad + 32
    offsets, heights, _ = _atlas_layout(cfg)
    blocks = []
    dtype = jnp.dtype(cfg.atlas_dtype)
    for o, g in enumerate(gauss_octaves):
        stacks = _magang_stacks(g, pad, dtype)  # (L, 2, h+2p, w+2p)
        region_h = (offsets[o + 1] if o + 1 < len(offsets)
                    else offsets[o] + -(-(heights[o] + 2 * pad) // 8) * 8
                    ) - offsets[o]
        extra_r = region_h - stacks.shape[-2]
        extra_c = w_max - stacks.shape[-1]
        blocks.append(jnp.pad(
            stacks, ((0, 0), (0, 0), (0, extra_r), (0, extra_c))))
    flat = jnp.concatenate(blocks, axis=-2)  # (L, 2, H_tot, W_max)
    n_l = flat.shape[0]
    h_tot = flat.shape[-2]
    folded = flat.reshape(n_l, 2, h_tot // 8, 8, w_max)
    # final layout (L, H8, 2, W*8): the channel PAIR sits on the
    # second-minor dim, which (a) makes a window one slice covering both
    # channels and (b) exactly matches bf16's 2-row sublane packing, so
    # the Pallas kernel's full-dim channel slice stays tile-aligned (a
    # size-1 dummy dim there gets folded into the packing by Mosaic and
    # becomes unsliceable)
    folded = jnp.transpose(folded, (0, 2, 1, 4, 3))  # (L, H8, 2, W, 8)
    folded = folded.reshape(n_l, h_tot // 8, 2, w_max * 8)
    # +2 zero chunks: a bottom-row keypoint's window block can overshoot
    # its region by up to R + 14 - pad <= 14 rows (see _magang_window)
    return jnp.pad(folded, ((0, 0), (0, 2), (0, 0), (0, 0)))


def _letterbox(gray: np.ndarray, size: int) -> np.ndarray:
    """Host-side: scale longest side to ``size`` and zero-pad to square.
    gray: (H, W) uint8 or float.

    uint8 input stays uint8 end-to-end (cv2's fixed-point INTER_LINEAR,
    the same arithmetic OpenCV pipelines feed cv2.SIFT): the letterboxed
    batch then crosses host->device as ONE byte per pixel and is cast to
    f32 on device (`_sift_core`). On this image's relay the f32 upload
    alone was ~32 ms/img — 4x the wire bytes of the kernel's actual
    input entropy (round-3 measurement, docs/PERF.md)."""
    import cv2

    h, w = gray.shape
    s = size / max(h, w)
    nh, nw = max(1, round(h * s)), max(1, round(w * s))
    if gray.dtype == np.uint8:
        resized = cv2.resize(gray, (nw, nh), interpolation=cv2.INTER_LINEAR)
        out = np.zeros((size, size), np.uint8)
    else:
        resized = cv2.resize(
            gray.astype(np.float32), (nw, nh), interpolation=cv2.INTER_LINEAR
        )
        out = np.zeros((size, size), np.float32)
    out[:nh, :nw] = resized
    return out


@partial(jax.jit, static_argnames=("cfg",))
def _sift_core(base_batch: jnp.ndarray, cfg: SiftConfig):
    """base_batch: (B, S, S) letterboxed grayscale, float 0..255 or uint8
    (uint8 is the production wire format — cast to f32 here, on device).

    Round-2 pipeline (retain-then-describe, the same order OpenCV's
    ``retainBest`` implies): detect+refine per octave -> merge candidates
    from all octaves -> keep the global top ``max_keypoints`` by response
    -> ONE orientation pass and ONE descriptor pass over the survivors,
    against a cross-octave gradient atlas. The round-1 code oriented and
    described every per-octave candidate (~8k descriptor evaluations per
    image for a 2,048 budget) before ranking.
    """
    base_batch = base_batch.astype(jnp.float32)
    # initial blur to cfg.sigma (assumed input blur 0.5, doubled by upscale)
    if cfg.upscale:
        b, s, _ = base_batch.shape
        up = jax.image.resize(base_batch, (b, 2 * s, 2 * s), "bilinear")
        sig_diff = math.sqrt(max(cfg.sigma**2 - 1.0, 0.01))
    else:
        up = base_batch
        sig_diff = math.sqrt(max(cfg.sigma**2 - 0.25, 0.01))
    base = gaussian_blur_batch(up, sig_diff)

    gauss, dog = _build_pyramids(base, cfg)

    # 1) detection per octave, tagged with the octave id
    per_octave = []
    for o in range(cfg.n_octaves):
        budget = cfg.octave_budget(o)
        out = _detect_octave(dog[o], budget, cfg)
        out["octave"] = jnp.full(out["r"].shape, o, jnp.int32)
        per_octave.append(out)
    merged = {
        k: jnp.concatenate([p[k] for p in per_octave], axis=1)
        for k in per_octave[0]
    }

    # 2) retain the global top-k candidates by response
    k = min(cfg.max_keypoints, merged["response"].shape[1])
    _, top_idx = jax.lax.top_k(merged["response"], k)
    cand = {
        name: jnp.take_along_axis(v, top_idx, axis=1)
        for name, v in merged.items()
    }

    # 3) orientation over a FLATTENED batch x candidate work queue.
    # Two structural properties make the patch stages cost what the actual
    # keypoints cost instead of the worst-case budget:
    #   * the queue is sorted by the patch radius each keypoint's scale
    #     needs (ori: round(4.5*scl) <= class radius; invalid rows last),
    #     and each fixed-radius class pass runs over the whole queue with
    #     other-class rows invalidated — contiguous after the sort;
    #   * the chunked pass runs UNBATCHED (``lax.map`` + scalar ``lax.cond``
    #     per chunk), so all-invalid / other-class chunks genuinely skip.
    #     The previous per-image layout vmapped the cond over the batch,
    #     and a vmapped cond executes BOTH branches — no skip at all.
    # Candidates address the batched atlas through their image id.
    offsets_np, heights_np, widths_np = _atlas_layout(cfg)
    offsets = jnp.asarray(offsets_np, jnp.int32)
    heights = jnp.asarray(heights_np, jnp.int32)
    widths = jnp.asarray(widths_np, jnp.int32)
    pad = cfg.desc_patch_radius

    def radius_class(scl, mult, radii):
        need = jnp.round(mult * scl)
        cls = jnp.searchsorted(jnp.asarray(radii, jnp.float32), need)
        return jnp.minimum(cls, len(radii) - 1).astype(jnp.int32)

    def flat_sorted_queue(rows_d, cls):
        """(B, k) row dict -> class-sorted flat (B*k,) dict + img ids +
        sorted classes + inverse permutation."""
        b_sz, kk = rows_d["valid"].shape
        flat = {
            name: v.reshape((b_sz * kk,) + v.shape[2:])
            for name, v in rows_d.items()
        }
        flat["img"] = jnp.repeat(jnp.arange(b_sz, dtype=jnp.int32), kk)
        cls = cls.reshape(-1)
        key = jnp.where(flat["valid"], cls, jnp.int32(len_radii_max))
        order = jnp.argsort(key, stable=True)
        inv = jnp.argsort(order)
        return (
            {name: v[order] for name, v in flat.items()},
            cls[order],
            inv,
        )

    len_radii_max = 1 << 15
    atlas = jax.vmap(lambda *gs: _grad_atlas(gs, cfg))(*gauss)
    b_sz = cand["valid"].shape[0]

    use_pallas = cfg.patch_backend == "pallas" or (
        cfg.patch_backend == "auto" and jax.default_backend() != "cpu"
    )
    interp = jax.default_backend() == "cpu"
    h8t = atlas.shape[2]
    atlas_flat = atlas.reshape(-1, 2, atlas.shape[-1])

    def pallas_operands(fq, pv, radius, f_row_off, f_hh, f_ww):
        """(ints, flts) operand arrays for the fused window kernels
        (ops/pallas/sift_window.py): flat-atlas window start rows,
        alignment residuals, and the per-candidate float scalars."""
        n_l = cfg.n_octave_layers
        gr = fq["r"] + pad + f_row_off
        rs = gr - radius
        ws = fq["c"] - radius + pad
        ws16 = (ws // 16) * 16
        row0 = (fq["img"] * n_l + (fq["layer"] - 1)) * h8t + rs // 8
        zi = jnp.zeros_like(ws)
        ints = jnp.stack(
            [row0, zi, pv.astype(jnp.int32), rs % 8,
             ws - ws16, ws16 * 8, zi, zi], axis=1)
        flts = jnp.stack(
            [fq["scl_oct"], fq["theta"] if "theta" in fq
             else jnp.zeros_like(fq["scl_oct"]),
             fq["r"].astype(jnp.float32), fq["c"].astype(jnp.float32),
             f_hh.astype(jnp.float32), f_ww.astype(jnp.float32),
             jnp.zeros_like(fq["scl_oct"]),
             jnp.zeros_like(fq["scl_oct"])], axis=1)
        return ints, flts

    ocls = radius_class(cand["scl_oct"], 4.5, cfg.ori_radius_classes)
    fq, ocls_s, inv = flat_sorted_queue(cand, ocls)
    f_row_off = offsets[fq["octave"]]
    f_hh = heights[fq["octave"]]
    f_ww = widths[fq["octave"]]
    bk = fq["valid"].shape[0]
    theta = jnp.zeros((bk,), jnp.float32)
    theta2 = jnp.zeros_like(theta)
    has_second = jnp.zeros((bk,), bool)
    for ci, radius in enumerate(cfg.ori_radius_classes):
        pv = fq["valid"] & (ocls_s == ci)
        if use_pallas:
            from .pallas.sift_window import orientation_window_pass

            ints, flts = pallas_operands(fq, pv, radius, f_row_off,
                                         f_hh, f_ww)
            t, t2, hs = _chunked_vmap(
                lambda i8, f8, radius=radius: orientation_window_pass(
                    atlas_flat, i8.T, f8, radius=radius, interpret=interp),
                (ints, flts),
                chunk=min(cfg.pallas_chunk, bk),
                valid=pv,
                batched=True,
            )
        else:
            t, t2, hs = _chunked_vmap(
                lambda im, l, rr, cc, s, v, ro, h_, w_: _orientation(
                    atlas, h_, w_, pad, l, rr, cc, s, v, cfg, ro,
                    radius=radius, img=im,
                ),
                (
                    fq["img"], fq["layer"], fq["r"], fq["c"], fq["scl_oct"],
                    pv, f_row_off, f_hh, f_ww,
                ),
                chunk=min(cfg.ori_chunk, bk),
                valid=pv,
            )
        theta, theta2 = theta + t, theta2 + t2
        has_second = has_second | hs
    theta = theta[inv].reshape(b_sz, k)
    theta2 = theta2[inv].reshape(b_sz, k)
    has_second = has_second[inv].reshape(b_sz, k)

    # 4) secondary-orientation duplicates, re-ranked into the same budget
    if cfg.multi_orientation:
        dup = dict(cand)
        dup["valid"] = cand["valid"] & has_second
        dup["response"] = jnp.where(dup["valid"], cand["response"], -1.0)
        rows = {
            name: jnp.concatenate([cand[name], dup[name]], axis=1)
            for name in cand
        }
        rows["theta"] = jnp.concatenate([theta, theta2], axis=1)
        _, top2 = jax.lax.top_k(
            jnp.where(rows["valid"], rows["response"], -1.0), k
        )
        rows = {
            name: jnp.take_along_axis(v, top2, axis=1)
            for name, v in rows.items()
        }
    else:
        rows = dict(cand)
        rows["theta"] = theta

    # 5) descriptor over the same flattened-queue layout, sorted by the
    # descriptor radius class (desc: round(3*sqrt(2)*2.5*scl) <= class R)
    dcls = radius_class(
        rows["scl_oct"], 3.0 * 1.4142135623730951 * 2.5, cfg.desc_radius_classes
    )
    fq, dcls_s, inv = flat_sorted_queue(rows, dcls)
    f_row_off = offsets[fq["octave"]]
    f_hh = heights[fq["octave"]]
    f_ww = widths[fq["octave"]]
    desc = jnp.zeros((bk, 128), jnp.float32)
    for ci, radius in enumerate(cfg.desc_radius_classes):
        pv = fq["valid"] & (dcls_s == ci)
        if use_pallas:
            from .pallas.sift_window import descriptor_window_pass

            ints, flts = pallas_operands(fq, pv, radius, f_row_off,
                                         f_hh, f_ww)
            desc = desc + _chunked_vmap(
                lambda i8, f8, radius=radius: descriptor_window_pass(
                    atlas_flat, i8.T, f8, radius=radius, interpret=interp),
                (ints, flts),
                chunk=min(cfg.pallas_chunk, bk),
                valid=pv,
                batched=True,
            )
        else:
            desc = desc + _chunked_vmap(
                lambda im, l, rr, cc, s, t, v, ro, h_, w_: _descriptor(
                    atlas, h_, w_, pad, l, rr, cc, s, t, v, cfg, ro,
                    radius=radius, img=im,
                ),
                (
                    fq["img"], fq["layer"], fq["r"], fq["c"], fq["scl_oct"],
                    fq["theta"], pv, f_row_off, f_hh, f_ww,
                ),
                chunk=min(cfg.desc_chunk, bk),
                valid=pv,
            )
    desc = desc[inv].reshape(b_sz, k, 128)

    # 6) outputs in process_size coordinates
    scale = (2.0 ** rows["octave"].astype(jnp.float32)) / (
        2.0 if cfg.upscale else 1.0
    )
    out = {
        "desc": desc,
        "x": (rows["c"].astype(jnp.float32) + rows["xc"]) * scale,
        "y": (rows["r"].astype(jnp.float32) + rows["xr"]) * scale,
        "size": rows["scl_oct"] * scale * 2.0,
        "theta": rows["theta"],
        "response": rows["response"],
        "mask": rows["valid"].astype(jnp.float32),
    }
    if k < cfg.max_keypoints:
        padn = cfg.max_keypoints - k
        out = {
            name: jnp.pad(v, ((0, 0), (0, padn)) + ((0, 0),) * (v.ndim - 2))
            for name, v in out.items()
        }
    return out


def _apply_root_sift(desc: jnp.ndarray) -> jnp.ndarray:
    """Hellinger map fused into the kernel
    (reference: _features.py:113-114)."""
    desc = desc / (jnp.sum(desc, axis=-1, keepdims=True) + 1e-7)
    return jnp.sqrt(desc)


def _pack_wire(out, keys=None):
    """Device-side wire packing for one chunk: descriptors cast to uint8
    (LOSSLESS — `_descriptor` saturate-casts to integers 0..255) and every
    other requested (B, N) float32 plane stacked into ONE ``_packed``
    array. The relay charges a fixed ~30-40 ms round trip per host fetch,
    so seven per-key fetches cost more in latency than their bytes; the
    packed layout makes a chunk exactly two fetches (_packed, then desc).
    ``keys`` filters which planes ride the wire (mask always does — the
    materializer needs it); the production encoder path only ever reads
    desc+mask, so it skips x/y/size/theta/response entirely."""
    names = tuple(
        k for k in out
        if k != "desc" and (keys is None or k in keys or k == "mask")
    )
    return {
        "desc": out["desc"].astype(jnp.uint8),
        "_packed": jnp.stack([out[k] for k in names]),
        "_packed_keys": names,
    }


def _materialize_wire(out, root_sift: bool) -> dict:
    """Fetch one wire-format chunk host-side. Rows are response-sorted
    valid-first (invalid rows rank at -1), so only the leading columns up
    to the batch's max valid count (bucketed to a power of two to bound
    the slice-shape set) cross the relay as uint8 (1 byte/element); the
    fixed descriptor budget is restored by zero-padding host-side, and
    root-SIFT (if any) is applied in f32 after the fetch. Shared by the
    single-device pipeline (`sift_descriptors`) and the mesh path
    (`parallel.sharded_sift_batch`)."""
    out = dict(out)
    packed_keys = out.pop("_packed_keys", None)
    if packed_keys is not None:
        packed = np.asarray(out.pop("_packed"))
        host = {k: packed[i] for i, k in enumerate(packed_keys)}
    else:
        host = {k: np.asarray(v) for k, v in out.items() if k != "desc"}
    mask = host["mask"]
    k_full = out["desc"].shape[1]
    n = max(int(mask.sum(axis=1).max()), 1)
    nb = k_full if n >= k_full else min(
        k_full, 1 << (n - 1).bit_length()
    )
    # avoid dispatching an identity slice (one relay round trip) when the
    # full column budget is being fetched anyway
    src = out["desc"] if nb == k_full else out["desc"][:, :nb]
    d = np.asarray(src).astype(np.float32)
    if root_sift:
        d = np.sqrt(d / (d.sum(axis=-1, keepdims=True) + 1e-7))
        d *= mask[:, :nb, None]
    if nb < k_full:
        full = np.zeros((d.shape[0], k_full, d.shape[-1]), np.float32)
        full[:, :nb] = d
        d = full
    host["desc"] = d
    return host


def sift_descriptors(
    grays: np.ndarray | list[np.ndarray],
    cfg: SiftConfig | None = None,
    root_sift: bool = False,
    keys: tuple[str, ...] | None = None,
    device: bool = False,
):
    """Full result dict for a batch of grayscale images (uint8/float 0..255
    HxW, any sizes — letterboxed host-side): desc (B, N, 128), mask (B, N),
    x, y, size, theta in processing coordinates. ``keys`` restricts which
    result planes are fetched on the multi-chunk wire path (desc + mask
    always are) — encoders pass ("desc", "mask") to skip five per-chunk
    relay round trips for geometry they never read.

    The batch is padded up to a power-of-two bucket so ragged batch sizes
    reuse a handful of compiled programs instead of recompiling per size
    (first TPU compile of this graph is tens of seconds). Batches larger
    than ``device_batch`` run as a sequence of device calls: the
    cross-octave gradient atlas is ~35 MB/image at 512², so an unbounded
    batch would exhaust HBM — and 16/device-call is also the measured
    throughput sweet spot (docs/PERF.md).
    """
    cfg = cfg or SiftConfig()
    if isinstance(grays, np.ndarray) and grays.ndim == 2:
        grays = [grays]
    b = len(grays)
    device_batch = int(os.environ.get("PYVISIM_SIFT_DEVICE_BATCH", "16"))

    def letterbox_chunk(i: int) -> np.ndarray:
        return np.stack(
            [
                _letterbox(np.asarray(g), cfg.process_size)
                for g in grays[i : i + device_batch]
            ]
        )

    def run_chunk(chunk: np.ndarray, wire: bool = False):
        """Upload + dispatch one device call; returns DEVICE arrays (the
        caller decides when to materialize, enabling pipelining). With
        ``wire=True`` the descriptor block is converted to uint8 on device
        (LOSSLESS — `_descriptor` saturate-casts to integers 0..255 like
        OpenCV) so the host fetch moves 1 byte/element; root-SIFT then
        happens host-side in `_materialize` (same f32 math)."""
        cb = chunk.shape[0]
        bucket = 1 << max(0, (cb - 1).bit_length())
        if bucket != cb:
            chunk = np.concatenate(
                [chunk, np.zeros((bucket - cb,) + chunk.shape[1:], chunk.dtype)]
            )
        out = _sift_core(jnp.asarray(chunk), cfg)
        out = {k: v[:cb] for k, v in out.items()}
        if wire:
            out = _pack_wire(out, keys)
        elif root_sift:
            out["desc"] = _apply_root_sift(out["desc"]) * out["mask"][..., None]
        return out

    if b <= device_batch:
        return run_chunk(letterbox_chunk(0))
    if device:
        # Device-resident multi-chunk (see sift_batch(device=True)):
        # dispatch every chunk behind the in-order queue and concatenate
        # ON DEVICE — no host materialization at all. Residency is
        # bounded by the caller's batch, so refuse gallery-sized requests
        # loudly instead of growing HBM ~1 MB/image until OOM (the same
        # trap ADVICE r2 flagged for the mesh path's device concat).
        if b > 16 * device_batch:
            raise ValueError(
                f"sift device=True keeps all {b} images' descriptors "
                f"device-resident (~{b} MB); cap the batch at "
                f"{16 * device_batch} (the encoders stream encoding maps "
                "in 64-image batches) or use the host wire path "
                "(device=False) for gallery-scale extraction."
            )
        chunk_outs = [
            run_chunk(letterbox_chunk(i)) for i in range(0, b, device_batch)
        ]
        want = keys or chunk_outs[0].keys()
        return {
            k: jnp.concatenate([o[k] for o in chunk_outs], axis=0)
            for k in chunk_outs[0]
            if k in want
        }
    return _pipeline_wire_chunks(
        lambda i: run_chunk(letterbox_chunk(i), wire=True),
        range(0, b, device_batch),
        root_sift,
    )


def _pipeline_wire_chunks(dispatch_chunk, starts, root_sift: bool) -> dict:
    """Two-deep host/device wire pipeline over gallery chunks: while the
    device computes chunk i-1, the host letterboxes chunk i and
    dispatches it behind the in-order queue; chunk i-1 is then fetched
    (np.asarray drains up to its completion). Host preprocessing and
    device compute overlap, and at most TWO chunks of outputs (~1 MB of
    descriptors per image) are device-resident at any time — an
    unbounded gallery still cannot pin HBM (round-2 invariant). The ONE
    implementation behind ``sift_descriptors`` and the mesh path
    (``parallel.sharded.sharded_sift_batch``); outputs accumulate
    host-side as f32 and concatenate per plane.

    ``dispatch_chunk(start)`` must upload + dispatch the chunk at
    ``start`` and return DEVICE wire arrays (``_pack_wire`` format).
    """
    outs: list[dict] = []
    pending = None
    for s in starts:
        cur = dispatch_chunk(s)
        if pending is not None:
            outs.append(_materialize_wire(pending, root_sift))
        pending = cur
    outs.append(_materialize_wire(pending, root_sift))
    return {k: np.concatenate([o[k] for o in outs], axis=0) for k in outs[0]}


def sift_single(
    gray01: np.ndarray,
    max_keypoints: int = 2048,
    root_sift: bool = False,
    cfg: SiftConfig | None = None,
):
    """(H, W) grayscale in [0, 1] -> (desc (N, 128), mask (N,))."""
    cfg = cfg or SiftConfig(max_keypoints=max_keypoints)
    if cfg.max_keypoints != max_keypoints:
        cfg = dataclasses.replace(cfg, max_keypoints=max_keypoints)
    out = sift_descriptors([np.asarray(gray01) * 255.0], cfg, root_sift=root_sift)
    return out["desc"][0], out["mask"][0]


def sift_batch(
    grays: list[np.ndarray],
    max_keypoints: int = 2048,
    root_sift: bool = False,
    cfg: SiftConfig | None = None,
    device: bool = False,
):
    """List of (H, W) uint8 grayscale -> (desc (B, N, 128), mask (B, N)).

    ``device=True`` returns DEVICE-RESIDENT jnp arrays (f32 descriptors,
    root-SIFT applied on device) instead of host numpy through the uint8
    wire: consumers that immediately encode on device (the
    VLAD/FV encoders — the reference's flagship gallery workflow) skip
    both the descriptor downlink AND the f32 re-upload. Memory stays
    bounded by the caller's batch size (the encoders' encoding-map
    streaming uses 64-image batches: ~64 MB of resident descriptors),
    unlike the unbounded-gallery wire path this mode does not replace.
    """
    cfg = cfg or SiftConfig(max_keypoints=max_keypoints)
    if cfg.max_keypoints != max_keypoints:
        cfg = dataclasses.replace(cfg, max_keypoints=max_keypoints)
    out = sift_descriptors(
        grays, cfg, root_sift=root_sift, keys=("desc", "mask"),
        device=device,
    )
    return out["desc"], out["mask"]
