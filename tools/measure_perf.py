"""Fetch-synchronized perf measurement for docs/PERF.md (run on TPU)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np, time, jax, jax.numpy as jnp, cv2, json
from pyvisim_tpu.ops.sift import SiftConfig, _sift_core, _letterbox
rng = np.random.default_rng(1)
base = rng.random((400, 600)).astype(np.float32)
img = cv2.GaussianBlur(base, (0,0), 2.0) * 255
img += cv2.GaussianBlur(rng.random((400,600)).astype(np.float32),(0,0),8)*100
img = np.clip(img - img.min(), 0, 255).astype(np.uint8)
cfg = SiftConfig(process_size=512, max_keypoints=2048)
lb = jnp.asarray(np.stack([_letterbox(img, 512)]*8))
out = _sift_core(lb, cfg); float(out["desc"].sum())
t0=time.perf_counter()
for _ in range(10): out = _sift_core(lb, cfg)
float(out["desc"].sum()); dt = time.perf_counter()-t0
print(json.dumps({"sift_img_s": round(8*10/dt, 1)}))

from pyvisim_tpu.ops.pallas import vlad_aggregate_pallas, fisher_stats_pallas
from pyvisim_tpu.ops.vlad import vlad_aggregate
from pyvisim_tpu.ops.fisher import fisher_stats
from pyvisim_tpu.ops import GmmCodebook
desc = jax.jit(lambda k: jax.random.normal(k, (50176, 512), jnp.float32))(jax.random.PRNGKey(0))
mask = jnp.ones((50176,), jnp.float32)
centers = jax.jit(lambda k: jax.random.normal(k, (256, 512), jnp.float32))(jax.random.PRNGKey(1))
def t(f):
    float(f().sum())
    t0=time.perf_counter()
    for _ in range(20): r = f()
    float(r.sum())
    return round((time.perf_counter()-t0)/20*1000, 3)
xla = jax.jit(lambda d, m, c: vlad_aggregate(d, m, c))
res = {"vlad_xla_ms": t(lambda: xla(desc, mask, centers)),
       "vlad_pallas_ms": t(lambda: vlad_aggregate_pallas(desc, mask, centers))}
w = jnp.ones((256,))/256.
cov = jnp.abs(centers)+0.5
gmm = GmmCodebook(weights=w, means=centers, covariances=cov)
xla_fv = jax.jit(lambda d, m: fisher_stats(d, m, gmm)[1])
res["fv_xla_ms"] = t(lambda: xla_fv(desc, mask))
res["fv_pallas_ms"] = t(lambda: fisher_stats_pallas(desc, mask, w, centers, cov)[1])
print(json.dumps(res))
