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
    refine_steps: int = 5
    # OpenCV emits an extra keypoint per secondary orientation peak
    # >= 0.8 * max (SIFT_ORI_PEAK_RATIO); False keeps only the dominant
    # orientation (faster, slightly fewer descriptors).
    multi_orientation: bool = True
    # candidate-axis chunk sizes for the orientation/descriptor patch
    # pipelines (memory vs sequential-step trade-off)
    ori_chunk: int = 256
    desc_chunk: int = 64

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
    """dog: (L+2, H, W) -> bool (L, H, W) for layers 1..L (3x3x3 extrema)."""
    d = dog
    center = d[1:-1]  # (L, H, W)

    shifts = []
    for dl in (-1, 0, 1):
        layer = d[1 + dl : d.shape[0] - 1 + dl]
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dl == 0 and dr == 0 and dc == 0:
                    continue
                shifts.append(jnp.roll(layer, (-dr, -dc), axis=(1, 2)))
    neighbors = jnp.stack(shifts)  # (26, L, H, W)
    is_max = jnp.all(center >= neighbors, axis=0) & (center > 0)
    is_min = jnp.all(center <= neighbors, axis=0) & (center < 0)
    mask = (jnp.abs(center) > prelim_thresh) & (is_max | is_min)
    # kill the 5px border (OpenCV SIFT_IMG_BORDER)
    h, w = mask.shape[1:]
    rr = jnp.arange(h)[:, None]
    cc = jnp.arange(w)[None, :]
    border = (rr >= 5) & (rr < h - 5) & (cc >= 5) & (cc < w - 5)
    return mask & border[None, :, :]


def _refine_candidates(dog, cand_layer, cand_r, cand_c, cand_valid, cfg: SiftConfig):
    """Iterative quadratic subpixel refinement (OpenCV adjustLocalExtrema).

    dog: (L+2, H, W) in 0..255 scale. cand_layer in [1, L]. Returns dict of
    per-candidate arrays: layer, r, c (ints), xr, xc, xi (offsets),
    contrast (normalized 0..1 scale), valid.
    """
    img_scale = 1.0 / 255.0
    deriv_scale = img_scale * 0.5
    second_deriv_scale = img_scale
    cross_deriv_scale = img_scale * 0.25
    h, w = dog.shape[1], dog.shape[2]
    n_layers = cfg.n_octave_layers

    def refine_one(layer, r, c, valid):
        def body(_, state):
            layer, r, c, xr, xc, xi, ok, converged = state

            cube = jax.lax.dynamic_slice(
                dog, (layer - 1, r - 1, c - 1), (3, 3, 3)
            )  # (layer, row, col)
            dD = (
                jnp.array(
                    [
                        cube[1, 1, 2] - cube[1, 1, 0],  # dx (col)
                        cube[1, 2, 1] - cube[1, 0, 1],  # dy (row)
                        cube[2, 1, 1] - cube[0, 1, 1],  # ds (layer)
                    ]
                )
                * deriv_scale
            )
            v2 = cube[1, 1, 1] * 2.0
            dxx = (cube[1, 1, 2] + cube[1, 1, 0] - v2) * second_deriv_scale
            dyy = (cube[1, 2, 1] + cube[1, 0, 1] - v2) * second_deriv_scale
            dss = (cube[2, 1, 1] + cube[0, 1, 1] - v2) * second_deriv_scale
            dxy = (
                cube[1, 2, 2] - cube[1, 2, 0] - cube[1, 0, 2] + cube[1, 0, 0]
            ) * cross_deriv_scale
            dxs = (
                cube[2, 1, 2] - cube[2, 1, 0] - cube[0, 1, 2] + cube[0, 1, 0]
            ) * cross_deriv_scale
            dys = (
                cube[2, 2, 1] - cube[2, 0, 1] - cube[0, 2, 1] + cube[0, 0, 1]
            ) * cross_deriv_scale
            H = jnp.array([[dxx, dxy, dxs], [dxy, dyy, dys], [dxs, dys, dss]])
            X = jnp.linalg.solve(
                H + 1e-12 * jnp.eye(3), dD
            )  # solve H X = dD; offset = -X
            xc_n, xr_n, xi_n = -X[0], -X[1], -X[2]

            done = (
                (jnp.abs(xc_n) < 0.5) & (jnp.abs(xr_n) < 0.5) & (jnp.abs(xi_n) < 0.5)
            )
            big = (
                (jnp.abs(xc_n) > 1e6) | (jnp.abs(xr_n) > 1e6) | (jnp.abs(xi_n) > 1e6)
            )
            step_c = jnp.round(xc_n).astype(jnp.int32)
            step_r = jnp.round(xr_n).astype(jnp.int32)
            step_l = jnp.round(xi_n).astype(jnp.int32)
            new_c = c + jnp.where(converged | done, 0, step_c)
            new_r = r + jnp.where(converged | done, 0, step_r)
            new_l = layer + jnp.where(converged | done, 0, step_l)
            inb = (
                (new_l >= 1)
                & (new_l <= n_layers)
                & (new_r >= 5)
                & (new_r < h - 5)
                & (new_c >= 5)
                & (new_c < w - 5)
            )
            ok = ok & inb & ~big
            new_conv = converged | done
            # keep refined offsets from the iteration that converged
            xr = jnp.where(converged, xr, xr_n)
            xc = jnp.where(converged, xc, xc_n)
            xi = jnp.where(converged, xi, xi_n)
            return (
                jnp.clip(new_l, 1, n_layers),
                jnp.clip(new_r, 1, h - 2),
                jnp.clip(new_c, 1, w - 2),
                xr,
                xc,
                xi,
                ok,
                new_conv,
            )

        state = (
            layer,
            r,
            c,
            jnp.float32(0),
            jnp.float32(0),
            jnp.float32(0),
            valid,
            jnp.bool_(False),
        )
        layer, r, c, xr, xc, xi, ok, converged = jax.lax.fori_loop(
            0, cfg.refine_steps, body, state
        )
        ok = ok & converged

        # final contrast + edge checks at the converged location
        cube = jax.lax.dynamic_slice(dog, (layer - 1, r - 1, c - 1), (3, 3, 3))
        dD = (
            jnp.array(
                [
                    cube[1, 1, 2] - cube[1, 1, 0],
                    cube[1, 2, 1] - cube[1, 0, 1],
                    cube[2, 1, 1] - cube[0, 1, 1],
                ]
            )
            * deriv_scale
        )
        contr = cube[1, 1, 1] * img_scale + 0.5 * (
            dD[0] * xc + dD[1] * xr + dD[2] * xi
        )
        ok = ok & (
            jnp.abs(contr) * n_layers >= cfg.contrast_threshold
        )
        v2 = cube[1, 1, 1] * 2.0
        dxx = (cube[1, 1, 2] + cube[1, 1, 0] - v2) * second_deriv_scale
        dyy = (cube[1, 2, 1] + cube[1, 0, 1] - v2) * second_deriv_scale
        dxy = (
            cube[1, 2, 2] - cube[1, 2, 0] - cube[1, 0, 2] + cube[1, 0, 0]
        ) * cross_deriv_scale
        tr = dxx + dyy
        det = dxx * dyy - dxy * dxy
        e = cfg.edge_threshold
        ok = ok & (det > 0) & (tr * tr * e < (e + 1) * (e + 1) * det)
        return layer, r, c, xr, xc, xi, contr, ok

    return jax.vmap(refine_one)(cand_layer, cand_r, cand_c, cand_valid)


# ---------------------------------------------------------------------------
# Orientation
# ---------------------------------------------------------------------------
def _grad_stacks(gauss: jnp.ndarray, pad: int):
    """Dense per-octave gradient stacks, zero-padded by ``pad`` on H/W.

    OpenCV convention: dx = I[r, c+1] - I[r, c-1]; dy = I[r-1, c] - I[r+1, c]
    (y-up). Computed once per octave so per-candidate patch extraction is a
    contiguous ``dynamic_slice`` instead of an element gather — the gathers
    were the dominant cost of the whole SIFT pipeline on TPU.
    """
    dx = jnp.pad(gauss[:, :, 2:] - gauss[:, :, :-2], ((0, 0), (0, 0), (1, 1)))
    dy = jnp.pad(gauss[:, :-2, :] - gauss[:, 2:, :], ((0, 0), (1, 1), (0, 0)))
    widths = ((0, 0), (pad, pad), (pad, pad))
    return jnp.pad(dx, widths), jnp.pad(dy, widths)


def _grad_patches(dxs, dys, layer, r, c, radius: int, h: int, w: int, pad: int):
    """(2R+1, 2R+1) dx/dy patches around (r, c) at ``layer`` via contiguous
    dynamic slices of the padded gradient stacks, plus the OpenCV
    border-validity mask (r, c within [1, dim-2])."""
    p = 2 * radius + 1
    start = (layer, r - radius + pad, c - radius + pad)
    dx = jax.lax.dynamic_slice(dxs, start, (1, p, p))[0]
    dy = jax.lax.dynamic_slice(dys, start, (1, p, p))[0]
    off = jnp.arange(-radius, radius + 1)
    rr = r + off[:, None]
    cc = c + off[None, :]
    inb = (rr >= 1) & (rr < h - 1) & (cc >= 1) & (cc < w - 1)
    return dx, dy, inb


def _orientation(dxs, dys, h, w, pad, layer, r, c, scl_oct, valid, cfg: SiftConfig):
    """Dominant gradient orientation (radians, OpenCV's grad-angle
    convention θ = atan2(dy, dx) with y-up dy). Histogram built as a dense
    (P², 36) one-hot-mix matmul; smoothing is OpenCV's [1,4,6,4,1]/16
    circular kernel; the peak is parabolically interpolated."""
    radius_f = jnp.round(4.5 * scl_oct)  # SIFT_ORI_RADIUS = 3 * 1.5
    sigma_w = 1.5 * scl_oct
    exp_scale = -1.0 / (2.0 * sigma_w * sigma_w)
    R = cfg.ori_patch_radius

    dx, dy, inb = _grad_patches(dxs, dys, layer, r, c, R, h, w, pad)
    off = jnp.arange(-R, R + 1).astype(jnp.float32)
    ii = off[:, None]
    jj = off[None, :]
    in_radius = (jnp.abs(ii) <= radius_f) & (jnp.abs(jj) <= radius_f)
    wmask = (inb & in_radius).astype(jnp.float32)
    wgt = jnp.exp((ii * ii + jj * jj) * exp_scale) * wmask
    mag = jnp.sqrt(dx * dx + dy * dy)
    ang = jnp.arctan2(dy, dx)  # (-pi, pi]
    n_bins = 36
    fbin = ang * (n_bins / (2.0 * jnp.pi))
    bin_idx = jnp.round(fbin).astype(jnp.int32) % n_bins  # OpenCV cvRound
    one_hot = jax.nn.one_hot(bin_idx.reshape(-1), n_bins)  # (P^2, 36)
    hist = jnp.dot(
        (wgt * mag).reshape(1, -1), one_hot, preferred_element_type=jnp.float32
    )[0]

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
def _descriptor(dxs, dys, h, w, pad, layer, r, c, scl_oct, theta, valid, cfg: SiftConfig):
    """128-D descriptor, OpenCV calcSIFTDescriptor semantics, built as a
    dense einsum over rank-1 trilinear weight products (no scatter)."""
    d, n = 4, 8
    hist_width = 3.0 * scl_oct
    cos_t = jnp.cos(theta) / hist_width
    sin_t = jnp.sin(theta) / hist_width
    bins_per_rad = n / (2.0 * jnp.pi)
    exp_scale = -1.0 / (d * d * 0.5)
    radius_f = jnp.round(hist_width * 1.4142135623730951 * (d + 1) * 0.5)
    R = cfg.desc_patch_radius

    dx, dy, inb = _grad_patches(dxs, dys, layer, r, c, R, h, w, pad)
    off = jnp.arange(-R, R + 1).astype(jnp.float32)
    ii = off[:, None] + jnp.zeros((1, 2 * R + 1))  # row offsets i
    jj = off[None, :] + jnp.zeros((2 * R + 1, 1))  # col offsets j
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

    ang = jnp.arctan2(dy, dx)
    obin = (ang - theta) * bins_per_rad  # relative orientation bins
    w = jnp.exp((c_rot * c_rot + r_rot * r_rot) * exp_scale)
    mag = jnp.sqrt(dx * dx + dy * dy) * w * ok.astype(dx.dtype)

    # trilinear weights as rank-1 products of small dense mixes
    r0 = jnp.floor(rbin)
    c0 = jnp.floor(cbin)
    o0f = jnp.floor(obin)
    rf = rbin - r0
    cf = cbin - c0
    of_ = obin - o0f
    o0 = (o0f.astype(jnp.int32) % n + n) % n

    p2 = (2 * R + 1) ** 2
    r_idx = (r0.astype(jnp.int32) + 1).reshape(p2)  # in [0, 4]
    c_idx = (c0.astype(jnp.int32) + 1).reshape(p2)
    o_idx = o0.reshape(p2)
    rf = rf.reshape(p2)
    cf = cf.reshape(p2)
    of_ = of_.reshape(p2)
    mag = mag.reshape(p2)

    # row/col mixes over d+2=6 bins; orientation over n+2=10 (o+1 may be n,
    # folded circularly below like OpenCV's border fold)
    wr = jax.nn.one_hot(r_idx, d + 2) * (1 - rf)[:, None] + jax.nn.one_hot(
        r_idx + 1, d + 2
    ) * rf[:, None]
    wc = jax.nn.one_hot(c_idx, d + 2) * (1 - cf)[:, None] + jax.nn.one_hot(
        c_idx + 1, d + 2
    ) * cf[:, None]
    wo = jax.nn.one_hot(o_idx, n + 2) * (1 - of_)[:, None] + jax.nn.one_hot(
        o_idx + 1, n + 2
    ) * of_[:, None]

    # hist[r, c, o] = sum_p mag_p * wr[p, r] * wc[p, c] * wo[p, o].
    # Contract r-bin by r-bin: each is a (d+2, P) x (P, n+2) matmul, so the
    # (P, 36) rank-3 intermediate never materializes (HBM-critical when
    # vmapped over thousands of candidates).
    rows = [
        jnp.dot(
            (wc * (wr[:, r] * mag)[:, None]).T,
            wo,
            preferred_element_type=jnp.float32,
        )
        for r in range(d + 2)
    ]
    hist = jnp.stack(rows)  # (d+2, d+2, n+2)

    # fold circular orientation borders, keep interior 4x4 spatial bins
    interior = hist[1 : d + 1, 1 : d + 1, :]
    folded = interior[:, :, :n].at[:, :, 0].add(interior[:, :, n])
    folded = folded.at[:, :, 1].add(interior[:, :, n + 1])
    vec = folded.reshape(d * d * n)

    # OpenCV normalization: clip at 0.2 * ||v||, rescale to 512, cap 255
    nrm2 = jnp.sum(vec * vec)
    thr = jnp.sqrt(nrm2) * 0.2
    vec = jnp.minimum(vec, thr)
    nrm2 = jnp.sum(vec * vec)
    scale = 512.0 / jnp.maximum(jnp.sqrt(nrm2), 1e-12)
    vec = jnp.minimum(vec * scale, 255.0)
    return jnp.where(valid, vec, 0.0)


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------
def _chunked_vmap(fn, args, chunk: int):
    """vmap ``fn`` over the leading axis, sequentially in chunks via
    ``lax.map`` — bounds the live memory of per-candidate patch pipelines
    (a full vmap would materialize every candidate's patches at once).
    ``fn`` may return an array or a pytree of arrays."""
    k = args[0].shape[0]
    if k % chunk != 0:
        chunk = math.gcd(k, chunk) or 1
    n_chunks = k // chunk
    reshaped = tuple(a.reshape((n_chunks, chunk) + a.shape[1:]) for a in args)
    out = jax.lax.map(lambda ch: jax.vmap(fn)(*ch), reshaped)
    return jax.tree_util.tree_map(
        lambda a: a.reshape((k,) + a.shape[2:]), out
    )


def _detect_octave(gauss_o, dog_o, budget, cfg: SiftConfig):
    """Single-image octave detection. gauss_o (L+3, H, W), dog_o (L+2, H, W)
    -> per-candidate arrays (budget,)."""
    prelim = math.floor(0.5 * cfg.contrast_threshold / cfg.n_octave_layers * 255)
    mask = _extrema_mask(dog_o, float(max(prelim, 1)))  # (L, H, W)
    score = jnp.abs(dog_o[1:-1]) * mask
    flat = score.reshape(-1)
    vals, idx = jax.lax.top_k(flat, budget)
    l_, hw = jnp.divmod(idx, mask.shape[1] * mask.shape[2])
    r_, c_ = jnp.divmod(hw, mask.shape[2])
    valid = vals > 0
    layer = (l_ + 1).astype(jnp.int32)

    layer, r, c, xr, xc, xi, contr, ok = _refine_candidates(
        dog_o, layer, r_.astype(jnp.int32), c_.astype(jnp.int32), valid, cfg
    )
    scl_oct = cfg.sigma * 2.0 ** ((layer.astype(jnp.float32) + xi) / cfg.n_octave_layers)

    h, w = gauss_o.shape[1], gauss_o.shape[2]
    pad = cfg.desc_patch_radius
    dxs, dys = _grad_stacks(gauss_o, pad)

    theta, theta2, has_second = _chunked_vmap(
        lambda l, rr, cc, s, v: _orientation(
            dxs, dys, h, w, pad, l, rr, cc, s, v, cfg
        ),
        (layer, r, c, scl_oct, ok),
        chunk=min(cfg.ori_chunk, budget),
    )

    def describe(thetas, valids):
        return _chunked_vmap(
            lambda l, rr, cc, s, t, v: _descriptor(
                dxs, dys, h, w, pad, l, rr, cc, s, t, v, cfg
            ),
            (layer, r, c, scl_oct, thetas, valids),
            chunk=min(cfg.desc_chunk, budget),
        )

    common = {
        "r": r.astype(jnp.float32) + xr,
        "c": c.astype(jnp.float32) + xc,
        "scl_oct": scl_oct,
    }
    out = {
        "desc": describe(theta, ok),
        "response": jnp.where(ok, jnp.abs(contr), -1.0),
        "valid": ok,
        "theta": theta,
        **common,
    }
    if cfg.multi_orientation:
        ok2 = ok & has_second
        out2 = {
            "desc": describe(theta2, ok2),
            "response": jnp.where(ok2, jnp.abs(contr), -1.0),
            "valid": ok2,
            "theta": theta2,
            **common,
        }
        out = {k: jnp.concatenate([out[k], out2[k]], axis=0) for k in out}
    return out


def _letterbox(gray: np.ndarray, size: int) -> np.ndarray:
    """Host-side: scale longest side to ``size`` and zero-pad to square.
    gray: (H, W) uint8 or float."""
    import cv2

    h, w = gray.shape
    s = size / max(h, w)
    nh, nw = max(1, round(h * s)), max(1, round(w * s))
    resized = cv2.resize(
        gray.astype(np.float32), (nw, nh), interpolation=cv2.INTER_LINEAR
    )
    out = np.zeros((size, size), np.float32)
    out[:nh, :nw] = resized
    return out


@partial(jax.jit, static_argnames=("cfg",))
def _sift_core(base_batch: jnp.ndarray, cfg: SiftConfig):
    """base_batch: (B, S, S) float 0..255 letterboxed grayscale."""
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

    per_octave = []
    for o in range(cfg.n_octaves):
        budget = cfg.octave_budget(o)
        out = jax.vmap(lambda g, d: _detect_octave(g, d, budget, cfg))(
            gauss[o], dog[o]
        )
        # positions back to process_size coordinates
        scale = (2.0**o) / (2.0 if cfg.upscale else 1.0)
        out["x"] = out.pop("c") * scale
        out["y"] = out.pop("r") * scale
        out["size"] = out.pop("scl_oct") * scale * 2.0
        per_octave.append(out)

    merged = {
        k: jnp.concatenate([p[k] for p in per_octave], axis=1)
        for k in per_octave[0]
    }
    # global top max_keypoints by response
    resp = jnp.where(merged["valid"], merged["response"], -1.0)
    k = min(cfg.max_keypoints, resp.shape[1])
    _, top_idx = jax.lax.top_k(resp, k)

    def take(a):
        return jnp.take_along_axis(
            a, top_idx.reshape(top_idx.shape + (1,) * (a.ndim - 2)), axis=1
        )

    out = {name: take(v) for name, v in merged.items()}
    out["mask"] = out.pop("valid").astype(jnp.float32)
    if k < cfg.max_keypoints:
        pad = cfg.max_keypoints - k
        out = {
            name: jnp.pad(v, ((0, 0), (0, pad)) + ((0, 0),) * (v.ndim - 2))
            for name, v in out.items()
        }
    return out


def _apply_root_sift(desc: jnp.ndarray) -> jnp.ndarray:
    """Hellinger map fused into the kernel
    (reference: _features.py:113-114)."""
    desc = desc / (jnp.sum(desc, axis=-1, keepdims=True) + 1e-7)
    return jnp.sqrt(desc)


def sift_descriptors(
    grays: np.ndarray | list[np.ndarray],
    cfg: SiftConfig | None = None,
    root_sift: bool = False,
):
    """Full result dict for a batch of grayscale images (uint8/float 0..255
    HxW, any sizes — letterboxed host-side): desc (B, N, 128), mask (B, N),
    x, y, size, theta in processing coordinates.

    The batch is padded up to a power-of-two bucket so ragged batch sizes
    reuse a handful of compiled programs instead of recompiling per size
    (first TPU compile of this graph is tens of seconds).
    """
    cfg = cfg or SiftConfig()
    if isinstance(grays, np.ndarray) and grays.ndim == 2:
        grays = [grays]
    base = np.stack([_letterbox(np.asarray(g), cfg.process_size) for g in grays])
    b = base.shape[0]
    bucket = 1 << max(0, (b - 1).bit_length())
    if bucket != b:
        base = np.concatenate(
            [base, np.zeros((bucket - b,) + base.shape[1:], base.dtype)]
        )
    out = _sift_core(jnp.asarray(base), cfg)
    out = {k: v[:b] for k, v in out.items()}
    if root_sift:
        out["desc"] = _apply_root_sift(out["desc"]) * out["mask"][..., None]
    return out


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
):
    """List of (H, W) uint8 grayscale -> (desc (B, N, 128), mask (B, N))."""
    cfg = cfg or SiftConfig(max_keypoints=max_keypoints)
    if cfg.max_keypoints != max_keypoints:
        cfg = dataclasses.replace(cfg, max_keypoints=max_keypoints)
    out = sift_descriptors(grays, cfg, root_sift=root_sift)
    return out["desc"], out["mask"]
