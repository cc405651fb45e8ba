"""W8A8 ViT prototype (r3 investigation — RESULT: not a win at the XLA level).

v5e MXU int8 doubles peak (measured 164 TOPs vs 97 TFLOPs bf16 isolated,
1.69x, /tmp int8_mxu sweep), and W8A8 accuracy is fine (1.9% relative feature
error with per-token dynamic activation quant). But END-TO-END the W8A8 ViT
ran 0.79x bf16 (263 vs 209 ms/64 crops): XLA materializes the quantized int8
activations and the int32 matmul outputs to HBM instead of fusing the
quant/dequant chains into the dot operands/epilogue — the same
materialization behavior found for int4 unpack chains in r2
(bench_quant_kernel.py). ~600 MB of int32 per MLP matmul eats the MXU win.

The known fix is a Pallas W8A8 kernel (quantize x in VMEM, int8 dot, fp
epilogue in VMEM) — backlog; ceiling ~1.3-1.4x encode. Kept as the
measurement record and the harness for that future kernel."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from slime_tpu.config import SliMEConfig
from slime_tpu.models import vit, layers as L
from slime_tpu.ops.encoder_attention import encoder_attention
import math

cfg = SliMEConfig.slime_8b().vision
vp = vit.init(jax.random.PRNGKey(0), cfg)
vp = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, vp)

def quant_w(w):  # [out,in] -> int8 + scale[out]
    wf = w.astype(jnp.float32)
    am = jnp.max(jnp.abs(wf), axis=1, keepdims=True)
    s = jnp.where(am > 0, am / 127.0, 1.0)
    return jnp.round(wf / s).astype(jnp.int8), s[:, 0]

def w8a8_linear(qw, ws, b, x):
    # x [.., in] bf16 -> per-token dynamic int8
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    am = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    xs = jnp.where(am > 0, am / 127.0, 1.0)
    xq = jnp.round(xf / xs).astype(jnp.int8)
    y = jax.lax.dot_general(xq, qw, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * xs * ws[None, :]
    y = y + b.astype(jnp.float32)[None]
    return y.reshape(*lead, -1).astype(x.dtype)

def make_qparams(vp):
    qs = []
    for lp in vp["layers"]:
        d = {}
        for k in ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2"):
            q, s = quant_w(lp[k]["weight"])
            d[k] = (q, s, lp[k]["bias"])
        qs.append(d)
    return qs

def attn_q(lp, qd, x):
    B, S, E = x.shape
    hd = E // cfg.num_heads
    q = w8a8_linear(*qd["q_proj"], x).reshape(B, S, cfg.num_heads, hd)
    k = w8a8_linear(*qd["k_proj"], x).reshape(B, S, cfg.num_heads, hd)
    v = w8a8_linear(*qd["v_proj"], x).reshape(B, S, cfg.num_heads, hd)
    out = encoder_attention(q, k, v, scale=1.0/math.sqrt(hd))
    return w8a8_linear(*qd["out_proj"], out.reshape(B, S, E))

def block_q(lp, qd, x):
    h = L.layer_norm(lp["layer_norm1"], x, eps=cfg.layer_norm_eps)
    x = x + attn_q(lp, qd, h)
    h = L.layer_norm(lp["layer_norm2"], x, eps=cfg.layer_norm_eps)
    h = w8a8_linear(*qd["fc2"], vit.quick_gelu(w8a8_linear(*qd["fc1"], h)))
    return x + h

def apply_q(vp, qs, pix):
    x = vit.embed_patches(vp, pix, cfg)
    x = L.layer_norm(vp["pre_layernorm"], x, eps=cfg.layer_norm_eps)
    n_run = cfg.num_layers + cfg.select_layer + 1
    for i in range(n_run):
        x = block_q(vp["layers"][i], qs[i], x)
    return x[:, 1:]

B = 64
r = np.random.default_rng(0)
pix = jnp.asarray(r.standard_normal((B, 3, 336, 336)).astype(np.float32)*0.5, jnp.bfloat16)
qs = make_qparams(vp)

jref = jax.jit(lambda vp, pix: vit.apply(vp, pix, cfg))
jq = jax.jit(apply_q)

ref = jref(vp, pix)
got = jq(vp, qs, pix)
err = float(jnp.mean(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
scale = float(jnp.std(ref.astype(jnp.float32)))
print(f"feature err: mean|d| {err:.4f} vs std {scale:.4f} -> rel {err/scale:.4f}", flush=True)

def timed(fn, *args, iters=8, reps=3):
    f = jax.jit(lambda vp, pix, *a: jnp.sum(jnp.ravel(fn(vp, *a, pix) if False else fn(*(a + (pix,))) if False else fn(vp, *a, pix))[:1].astype(jnp.float32)))
    return None

# timing: loop in jit
def time_encode(applyfn, args, iters=8, reps=3):
    @jax.jit
    def loop(*a):
        def body(c, _):
            out = applyfn(*a[:-1], a[-1] + c*1e-6)
            return jnp.ravel(out)[0].astype(jnp.bfloat16), None
        c, _ = jax.lax.scan(body, jnp.bfloat16(0), None, length=iters)
        return c
    float(loop(*args).astype(jnp.float32))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); float(loop(*args).astype(jnp.float32))
        best = min(best, (time.perf_counter()-t0)/iters)
    return best

tb = time_encode(lambda vp, pix: vit.apply(vp, pix, cfg), (vp, pix))
print(f"bf16 encode:        {tb*1e3:.1f} ms/call ({B/tb:.0f} crops/s)", flush=True)
tq = time_encode(apply_q, (vp, qs, pix))
print(f"w8a8 XLA encode:    {tq*1e3:.1f} ms/call ({B/tq:.0f} crops/s)  "
      f"speedup {tb/tq:.2f}x", flush=True)

# r3 fused path: quantize_tower + the Pallas W8A8 kernel (ops/w8a8_matmul.py)
qtower = vit.quantize_tower(vp, cfg)
gotp = jax.jit(lambda p, pix: vit.apply(p, pix, cfg))(qtower, pix)
errp = float(jnp.mean(jnp.abs(gotp.astype(jnp.float32) - ref.astype(jnp.float32))))
print(f"pallas feature err: mean|d| {errp:.4f} vs std {scale:.4f} -> "
      f"rel {errp/scale:.4f}", flush=True)
tp = time_encode(lambda p, pix: vit.apply(p, pix, cfg), (qtower, pix))
print(f"w8a8 pallas encode: {tp*1e3:.1f} ms/call ({B/tp:.0f} crops/s)  "
      f"speedup {tb/tp:.2f}x", flush=True)
