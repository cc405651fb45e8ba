"""A/B: fp-packed QKV ([3E,E] single dot) vs separate q/k/v projections in the
CLIP-L encode hot path (VERDICT r3 #9 — the remaining vision-encode gap lives
in the MLP/projection fusions, not attention).

Hypothesis: one [3E,E] matmul replaces three [E,E] dots; at E=1024 each lone
dot's output tile is only 1024 wide (half-empty MXU lanes at the 64-crop
batch) and the activation tile is read three times. Interleaved reps, tunnel
fenced with a host transfer. Prints both rates and the ratio.

MEASURED VERDICT (v5e, r4): packing LOSES end-to-end — 0.868x with
interleaved-axis (B,S,3,nh,hd) slices, 0.933x with contiguous jnp.split
(208 -> 223 ms per 64-crop encode). XLA schedules three separate [E,E] dots
into the surrounding graph better than one [3E,E] dot it must split after;
the packed layout stays for the QUANTIZED tower only, where one activation
read+quant pass pays for it. Full roofline memo: docs/Serving.md
"Vision encode: the roofline memo".
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from slime_tpu.config import SliMEConfig
    from slime_tpu.models import vit

    cfg = SliMEConfig.slime_8b()
    rng = jax.random.PRNGKey(0)
    params = vit.init(rng, cfg.vision)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
    packed = vit.pack_qkv_tower(params, cfg.vision)

    N = 64  # crops per call (8 images x (1+7) views — the bench_vision regime)
    t = cfg.vision.image_size
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((N, 3, t, t)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    fn = jax.jit(lambda p, x: vit.apply(p, x, cfg.vision).sum())

    # exactness first: packing must be bit-identical math (same dots, fused)
    a = float(fn(params, x))
    b = float(fn(packed, x))
    rel = abs(a - b) / max(abs(a), 1e-9)
    print(f"sum delta rel {rel:.2e}", file=sys.stderr, flush=True)
    assert rel < 5e-3, (a, b)

    def timeit(p, iters=12):
        float(fn(p, x))
        t0 = time.perf_counter()
        for _ in range(iters - 1):
            fn(p, x)
        float(fn(p, x))
        return (time.perf_counter() - t0) / iters

    # interleave 3 reps of each to cancel chip-contention drift
    sep, pk = [], []
    for _ in range(3):
        sep.append(timeit(params))
        pk.append(timeit(packed))
    sep_ms = 1000 * min(sep)
    pk_ms = 1000 * min(pk)
    print(f"separate qkv: {sep_ms:.1f} ms/encode ({N / (sep_ms / 1000):.0f} crops/s)")
    print(f"packed qkv:   {pk_ms:.1f} ms/encode ({N / (pk_ms / 1000):.0f} crops/s)")
    print(f"speedup: {sep_ms / pk_ms:.3f}x")


if __name__ == "__main__":
    main()
