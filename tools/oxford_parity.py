"""Oxford-102 quality-parity harness (BASELINE.md gates).

Runs the reference's headline evaluation end-to-end on this framework:
gallery = train split (6,149, swapped-split semantics), queries =
validation + test (2,040), VGG16 last-conv deep features with spatial
encoding, k=256 vocabulary — and compares top-1/top-5/mAP against the
reference's published notebook numbers (BASELINE.md).

Requirements (not available in the zero-egress build image, which is why
the in-repo stand-in gate is tests/test_integration_retrieval.py):
  * network access for the dataset download, and
  * a torchvision VGG16 checkpoint (--vgg16-pth) for pretrained features.

Usage:
  python tools/oxford_parity.py --vgg16-pth /path/to/vgg16.pth \
      [--encoder vlad|fisher] [--subsample N] [--out report.json]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

REFERENCE_GATES = {
    # BASELINE.md rows (pretrained VGG16, k=256)
    "vlad": {"top1": 0.6975, "top5": 0.8672},
    "fisher": {"top1": 0.6672, "top5": 0.8387},
}
TOLERANCE = 0.005  # mAP/accuracy parity gate: +-0.5% (BASELINE.md)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg16-pth", required=True)
    ap.add_argument("--encoder", choices=["vlad", "fisher"], default="vlad")
    ap.add_argument("--subsample", type=int, default=None,
                    help="use every Nth train image for vocabulary learning")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--out", default="oxford_parity_report.json")
    args = ap.parse_args()

    import torch

    from pyvisim_tpu.datasets import OxfordFlowerDataset
    from pyvisim_tpu.encoders import FisherVectorEncoder, VLADEncoder
    from pyvisim_tpu.eval import top_k_accuracy, top_k_map
    from pyvisim_tpu.features import DeepConvFeature
    from pyvisim_tpu.models.vgg import params_from_torch_state_dict
    from pyvisim_tpu.profiling import Throughput

    sd = torch.load(args.vgg16_pth, map_location="cpu")
    params = params_from_torch_state_dict(
        {k: v.numpy() for k, v in sd.items()}, "vgg16"
    )
    ext = DeepConvFeature(cfg_name="vgg16", params=params, spatial_encoding=True)

    train = OxfordFlowerDataset(purpose="train")
    queries = OxfordFlowerDataset(purpose=["validation", "test"])
    print(f"gallery={len(train)} queries={len(queries)}")

    enc_cls = VLADEncoder if args.encoder == "vlad" else FisherVectorEncoder
    encoder = enc_cls(feature_extractor=ext)
    step = args.subsample or 4
    vocab_imgs = [train[i][0] for i in range(0, len(train), step)]
    t0 = time.time()
    encoder.learn(vocab_imgs, n_clusters=256, max_descriptors=2_000_000)
    print(f"vocabulary learned in {time.time() - t0:.0f}s")

    meter = Throughput()
    emap = encoder.generate_encoding_map(
        train.image_paths, batch_size=args.batch_size
    )
    meter.update(len(train))
    print(f"gallery encoded at {meter.rate:.0f} img/s")

    path_labels = dict(zip(train.image_paths, train.labels))
    q_imgs = [queries[i][0] for i in range(len(queries))]
    results = {
        "encoder": args.encoder,
        "gallery_throughput_img_s": round(meter.rate, 1),
        "top1": top_k_accuracy(q_imgs, queries.labels, emap, path_labels, encoder, k=1),
        "top5": top_k_accuracy(q_imgs, queries.labels, emap, path_labels, encoder, k=5),
        "map5": top_k_map(q_imgs, queries.labels, emap, path_labels, encoder, k=5),
        "map": top_k_map(q_imgs, queries.labels, emap, path_labels, encoder),
    }
    gates = REFERENCE_GATES[args.encoder]
    results["gates"] = {
        k: {
            "reference": gates[k],
            "ours": results[k],
            "pass": results[k] >= gates[k] - TOLERANCE,
        }
        for k in gates
    }
    print(json.dumps(results, indent=2))
    pathlib.Path(args.out).write_text(json.dumps(results, indent=2))
    ok = all(g["pass"] for g in results["gates"].values())
    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
