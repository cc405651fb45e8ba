"""Decompose bench_vision's per-call time: preproc | vit | proj+compress, pallas on/off."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from slime_tpu.config import SliMEConfig
from slime_tpu.data.image_ops import make_device_anyres_fn
from slime_tpu.models import projector as proj_mod, sampler as samp_mod, vit

cfg = SliMEConfig.slime_8b()
rng = jax.random.PRNGKey(0)
to_bf16 = lambda t: jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
vp = to_bf16(vit.init(rng, cfg.vision))
pp = to_bf16(proj_mod.init(jax.random.fold_in(rng, 1), cfg))
sp = to_bf16(samp_mod.init(jax.random.fold_in(rng, 2), cfg))
H = W = 672; N = 8
pre = make_device_anyres_fn((H, W))
MC = 1 + cfg.max_local_crops
imgs = jnp.asarray(np.random.default_rng(0).integers(0, 255, (N, H, W, 3), np.uint8))

@jax.jit
def preproc(imgs):
    crops, masks = jax.vmap(pre)(imgs)
    return crops.reshape(-1, 3, 336, 336).astype(jnp.bfloat16), masks

@jax.jit
def encode(vp, flat):
    return vit.apply(vp, flat, cfg.vision)

@jax.jit
def project(pp, sp, feats):
    feats = feats.reshape(N, MC, *feats.shape[1:])
    g = proj_mod.apply(pp, feats[:, 0], cfg=cfg)
    lc = samp_mod.compress(sp, feats[:, 1:].reshape(-1, *feats.shape[2:]), cfg=cfg)
    lp = proj_mod.apply(pp, lc, cfg=cfg)
    return g.sum() + lp.sum()

def fence(f, *a, reps=5):
    r = f(*a); jax.tree_util.tree_leaves(r)[0]
    float(jnp.sum(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[:1].astype(jnp.float32)))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*a)
        float(jnp.sum(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[:1].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, r

for env in ("1", "0"):
    os.environ["SLIME_USE_PALLAS_ATTN"] = env
    encode2 = jax.jit(lambda vp, flat: vit.apply(vp, flat, cfg.vision))
    t_pre, (flat, masks) = fence(preproc, imgs)
    t_enc, feats = fence(encode2, vp, flat)
    t_proj, _ = fence(project, pp, sp, feats)
    print(f"pallas={env}: preproc {t_pre:.1f} ms | vit({flat.shape[0]} crops) {t_enc:.1f} ms | proj+compress {t_proj:.1f} ms", flush=True)
