"""Sweep SIFT candidate-chunk sizes (fetch-synced, TPU)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import numpy as np, time, jax, jax.numpy as jnp, cv2, json
import pyvisim_tpu.ops.sift as S

rng = np.random.default_rng(1)
base = rng.random((400, 600)).astype(np.float32)
img = cv2.GaussianBlur(base, (0,0), 2.0) * 255
img += cv2.GaussianBlur(rng.random((400,600)).astype(np.float32),(0,0),8)*100
img = np.clip(img - img.min(), 0, 255).astype(np.uint8)
lb = jnp.asarray(np.stack([S._letterbox(img, 512)]*8))

def run(ori_chunk, desc_chunk, steps=3):
    cfg = S.SiftConfig(process_size=512, max_keypoints=2048,
                       ori_chunk=ori_chunk, desc_chunk=desc_chunk)
    out = S._sift_core(lb, cfg)
    float(out["desc"].sum())
    t0 = time.perf_counter()
    for _ in range(steps):
        out = S._sift_core(lb, cfg)
    float(out["desc"].sum())
    return round(8*steps/(time.perf_counter()-t0), 2)

for oc, dc in [(256, 64), (1024, 256), (2048, 512)]:
    print(json.dumps({"ori_chunk": oc, "desc_chunk": dc, "img_s": run(oc, dc)}), flush=True)
