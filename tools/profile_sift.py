"""On-chip cumulative stage profile of the SIFT pipeline.

Times jitted prefixes of ops/sift._sift_core (pyramid -> detect -> atlas ->
orientation -> descriptor) fetch-synchronized (CLAUDE.md: block_until_ready
does not synchronize on this backend; a scalar checksum fetch drains the
queue). Per-stage cost is the difference of adjacent cumulative rows.

Usage: python tools/profile_sift.py [--batch 8] [--iters 5] [--kp 2048]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--kp", type=int, default=2048)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from functools import partial

    from pyvisim_tpu.ops import sift as S
    from train_vocabularies import synthetic_corpus

    cfg = S.SiftConfig(max_keypoints=args.kp)
    imgs = synthetic_corpus(args.batch, 0, size=cfg.process_size)
    base = np.stack(
        [S._letterbox(i.mean(axis=2), cfg.process_size) for i in imgs]
    )
    base_j = jnp.asarray(base)

    import math

    def prefix(stage):
        @partial(jax.jit, static_argnames=())
        def run(bb):
            if cfg.upscale:
                b, s, _ = bb.shape
                up = jax.image.resize(bb, (b, 2 * s, 2 * s), "bilinear")
                sig_diff = math.sqrt(max(cfg.sigma**2 - 1.0, 0.01))
            else:
                up = bb
                sig_diff = math.sqrt(max(cfg.sigma**2 - 0.25, 0.01))
            base = S.gaussian_blur_batch(up, sig_diff)
            gauss, dog = S._build_pyramids(base, cfg)
            if stage == "pyramid":
                return sum(jnp.sum(g[:, -1, ::7, ::7]) for g in gauss)
            if stage == "mask":
                prelim = math.floor(
                    0.5 * cfg.contrast_threshold / cfg.n_octave_layers * 255
                )
                tot = 0.0
                for o in range(cfg.n_octaves):
                    m = jax.vmap(
                        lambda d: S._extrema_mask(d, float(max(prelim, 1)))
                    )(dog[o])
                    tot = tot + jnp.sum(m[:, :, ::3, ::3])
                return tot
            if stage == "topk":
                tot = 0.0
                for o in range(cfg.n_octaves):
                    budget = cfg.octave_budget(o)

                    def tk(dog_o, budget=budget):
                        vals, layer, r_, c_, valid = S._rank_candidates(
                            dog_o, budget, cfg
                        )
                        return jnp.sum(vals.astype(jnp.float32)) + jnp.sum(r_)
                    tot = tot + jnp.sum(jax.vmap(tk)(dog[o]))
                return tot
            if stage == "gather":
                # production-path refine window gather (the Pallas
                # refine_gather_pass on non-CPU backends, matching
                # _refine_candidates' operand construction; the old
                # version timed the XLA fallback _gather_refine_patches,
                # which production does not run on TPU)
                from pyvisim_tpu.ops.pallas.sift_window import (
                    refine_gather_pass,
                )

                reach = cfg.refine_reach
                side = 2 * reach + 3
                nq = (side + 14) // 8
                tot = 0.0
                for o in range(cfg.n_octaves):
                    budget = cfg.octave_budget(o)
                    dog_o = dog[o]
                    b_sz = dog_o.shape[0]
                    _v, _l, r_, c_, ok_ = jax.vmap(
                        lambda d: S._rank_candidates(d, budget, cfg)
                    )(dog_o)
                    folded = jax.vmap(lambda d: S._fold_dog(d, cfg))(dog_o)
                    k = r_.shape[1]
                    im = jnp.repeat(jnp.arange(b_sz, dtype=jnp.int32), k)
                    if jax.default_backend() == "cpu":
                        pat, _s0 = S._gather_refine_patches(
                            folded, im, r_.reshape(-1), c_.reshape(-1), cfg)
                        tot = tot + jnp.sum(pat[:, :, ::3, ::3])
                        continue
                    h8t = folded.shape[1]
                    n_total = folded.shape[2]
                    dog_flat = folded.reshape(-1, n_total, folded.shape[-1])
                    cand_r = r_.reshape(-1)
                    cand_c = c_.reshape(-1)
                    col16 = (cand_c * 8) // 128 * 16
                    zi = jnp.zeros_like(cand_r)
                    ints = jnp.stack(
                        [im * h8t + cand_r // 8, zi,
                         ok_.reshape(-1).astype(jnp.int32),
                         zi, zi, col16 * 8, zi, zi], axis=0)
                    # production chunks the refine queue (refine_chunk);
                    # one whole-queue pass would also overflow SMEM with
                    # the (8, n) scalar-prefetch operand
                    nrow = ints.shape[1]
                    ck = min(cfg.refine_chunk, nrow)
                    for s0 in range(0, nrow - nrow % ck, ck):
                        blk = refine_gather_pass(
                            dog_flat,
                            jax.lax.dynamic_slice_in_dim(ints, s0, ck, 1),
                            n_layers=n_total, side=side, nq=nq)
                        tot = tot + jnp.sum(blk[:, :, ::3, ::31])
                return tot
            per_octave = []
            for o in range(cfg.n_octaves):
                budget = cfg.octave_budget(o)
                out = S._detect_octave(dog[o], budget, cfg)
                out["octave"] = jnp.full(out["r"].shape, o, jnp.int32)
                per_octave.append(out)
            merged = {
                k: jnp.concatenate([p[k] for p in per_octave], axis=1)
                for k in per_octave[0]
            }
            k = min(cfg.max_keypoints, merged["response"].shape[1])
            _, top_idx = jax.lax.top_k(merged["response"], k)
            cand = {
                n: jnp.take_along_axis(v, top_idx, axis=1)
                for n, v in merged.items()
            }
            if stage == "detect":
                return jnp.sum(cand["response"]) + jnp.sum(cand["r"])
            offsets_np, heights_np, widths_np = S._atlas_layout(cfg)
            offsets = jnp.asarray(offsets_np, jnp.int32)
            heights = jnp.asarray(heights_np, jnp.int32)
            widths = jnp.asarray(widths_np, jnp.int32)
            pad = cfg.desc_patch_radius
            atlas = jax.vmap(lambda *gs: S._grad_atlas(gs, cfg))(*gauss)
            if stage == "atlas":
                return jnp.sum(atlas[:, 0, ::31, ::31, 0]) + jnp.sum(
                    cand["response"]
                )

            # mirror _sift_core's flattened class-sorted queue
            b_sz = cand["valid"].shape[0]
            flat = {
                n: v.reshape((b_sz * k,) + v.shape[2:]) for n, v in cand.items()
            }
            flat["img"] = jnp.repeat(jnp.arange(b_sz, dtype=jnp.int32), k)
            need = jnp.round(4.5 * flat["scl_oct"])
            ocls = jnp.minimum(
                jnp.searchsorted(
                    jnp.asarray(cfg.ori_radius_classes, jnp.float32), need
                ),
                len(cfg.ori_radius_classes) - 1,
            ).astype(jnp.int32)
            key = jnp.where(flat["valid"], ocls, jnp.int32(1 << 15))
            order = jnp.argsort(key, stable=True)
            fq = {n: v[order] for n, v in flat.items()}
            ocls_s = ocls[order]
            f_ro = offsets[fq["octave"]]
            f_hh = heights[fq["octave"]]
            f_ww = widths[fq["octave"]]
            bk = b_sz * k
            theta = jnp.zeros((bk,), jnp.float32)
            theta2 = jnp.zeros((bk,), jnp.float32)
            has_second = jnp.zeros((bk,), bool)
            use_pallas = jax.default_backend() != "cpu"
            h8t = atlas.shape[2]
            atlas_flat = atlas.reshape(-1, 2, atlas.shape[-1])
            n_l = cfg.n_octave_layers
            for ci, radius in enumerate(cfg.ori_radius_classes):
                pv = fq["valid"] & (ocls_s == ci)
                if use_pallas:
                    # mirror _sift_core's production pallas dispatch
                    # (the XLA _orientation fallback is NOT what runs
                    # on TPU — timing it misattributes the stage)
                    from pyvisim_tpu.ops.pallas.sift_window import (
                        orientation_window_pass,
                    )

                    gr = fq["r"] + pad + f_ro
                    rs = gr - radius
                    ws = fq["c"] - radius + pad
                    ws16 = (ws // 16) * 16
                    row0 = (fq["img"] * n_l + (fq["layer"] - 1)) * h8t \
                        + rs // 8
                    zi = jnp.zeros_like(ws)
                    ints = jnp.stack(
                        [row0, zi, pv.astype(jnp.int32), rs % 8,
                         ws - ws16, ws16 * 8, zi, zi], axis=1)
                    flts = jnp.stack(
                        [fq["scl_oct"], jnp.zeros_like(fq["scl_oct"]),
                         fq["r"].astype(jnp.float32),
                         fq["c"].astype(jnp.float32),
                         f_hh.astype(jnp.float32),
                         f_ww.astype(jnp.float32),
                         jnp.zeros_like(fq["scl_oct"]),
                         jnp.zeros_like(fq["scl_oct"])], axis=1)
                    t, t2, hs = S._chunked_vmap(
                        lambda i8, f8, radius=radius:
                        orientation_window_pass(
                            atlas_flat, i8.T, f8, radius=radius),
                        (ints, flts),
                        chunk=min(cfg.pallas_chunk, bk),
                        valid=pv,
                        batched=True,
                    )
                else:
                    t, t2, hs = S._chunked_vmap(
                        lambda im, l, rr, cc, s, v, ro, h_, w_:
                        S._orientation(
                            atlas, h_, w_, pad, l, rr, cc, s, v, cfg, ro,
                            radius=radius, img=im,
                        ),
                        (
                            fq["img"], fq["layer"], fq["r"], fq["c"],
                            fq["scl_oct"], pv, f_ro, f_hh, f_ww,
                        ),
                        chunk=min(cfg.ori_chunk, bk),
                        valid=pv,
                    )
                theta = theta + t
                theta2 = theta2 + t2
                has_second = has_second | hs
            if stage == "orient":
                return jnp.sum(theta)

            # step-4 mirror: secondary-orientation duplicates re-ranked
            # into the budget + the descriptor-class queue sort — the
            # batch-wide glue between the two window-kernel stages
            inv = jnp.argsort(order)
            theta_b = theta[inv].reshape(b_sz, k)
            theta2_b = theta2[inv].reshape(b_sz, k)
            hs_b = has_second[inv].reshape(b_sz, k)
            dup = dict(cand)
            dup["valid"] = cand["valid"] & hs_b
            dup["response"] = jnp.where(dup["valid"], cand["response"], -1.0)
            rows_d = {
                n: jnp.concatenate([cand[n], dup[n]], axis=1) for n in cand
            }
            rows_d["theta"] = jnp.concatenate([theta_b, theta2_b], axis=1)
            _, top2 = jax.lax.top_k(
                jnp.where(rows_d["valid"], rows_d["response"], -1.0), k
            )
            rows_d = {
                n: jnp.take_along_axis(v, top2, axis=1)
                for n, v in rows_d.items()
            }
            need_d = jnp.round(3.0 * 1.4142135623730951 * 2.5
                               * rows_d["scl_oct"])
            dcls = jnp.minimum(
                jnp.searchsorted(
                    jnp.asarray(cfg.desc_radius_classes, jnp.float32),
                    need_d.reshape(-1),
                ),
                len(cfg.desc_radius_classes) - 1,
            ).astype(jnp.int32)
            flat_d = {
                n: v.reshape((b_sz * k,) + v.shape[2:])
                for n, v in rows_d.items()
            }
            flat_d["img"] = jnp.repeat(jnp.arange(b_sz, dtype=jnp.int32), k)
            key_d = jnp.where(flat_d["valid"], dcls, jnp.int32(1 << 15))
            order_d = jnp.argsort(key_d, stable=True)
            fq_d = {n: v[order_d] for n, v in flat_d.items()}
            if stage == "rerank":
                return (jnp.sum(fq_d["theta"]) + jnp.sum(fq_d["r"])
                        + jnp.sum(jnp.argsort(order_d)))
            return None  # unused

        return run

    def timed(fn, *a):
        out = fn(*a)
        _ = float(np.asarray(out if out is not None else 0).sum())  # warmup+compile
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(*a)
        _ = float(np.asarray(out if out is not None else 0).sum())
        return (time.time() - t0) / args.iters / args.batch * 1000.0

    rows = []
    for stage in ("pyramid", "mask", "topk", "gather", "detect", "atlas",
                  "orient", "rerank"):
        ms = timed(prefix(stage), base_j)
        rows.append((stage, ms))
        print(f"cumulative through {stage:8s}: {ms:7.2f} ms/img", flush=True)

    full = jax.jit(lambda bb: S._sift_core(bb, cfg)["desc"])
    ms = timed(full, base_j)
    rows.append(("full", ms))
    print(f"cumulative through {'full':8s}: {ms:7.2f} ms/img")
    prev = 0.0
    print("\nper-stage deltas:")
    for stage, ms in rows:
        print(f"  {stage:8s}: {ms - prev:7.2f} ms/img")
        prev = ms


if __name__ == "__main__":
    main()
