"""Pin the q4g ceiling: isolate DMA vs nibble-unpack cost on one chip.

Three Pallas kernels stream the SAME packed q4g buffer (one 8B-shaped
gate_proj stack, [32, 14336, 2048] int8 = 0.94 GB):

  dma:         load each chunk, int32-sum it (no unpack)     -> HBM stream rate
  unpack:      load + full nibble unpack (shift variant) + sum of values
               -> DMA + VPU unpack, no MXU
  unpack_dot:  load + unpack + per-group dot against a [1, H] activation
               -> the real contraction structure (what the decode kernel does)

The (unpack - dma) delta is the non-overlapped VPU cost of int32-formulated
nibble extraction — the quantity that decides whether int4 can ever beat
int8's weight stream on this hardware generation (VERDICT r4 #4 memo).
Prints one JSON line per kernel.
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from slime_tpu.ops.fused_mlp import _unpack_nibbles

    tiny = os.environ.get("SLIME_PROBE_TINY") == "1"   # CPU interpret smoke
    L, I, H = (2, 512, 256) if tiny else (32, 14336, 4096)
    shp = os.environ.get("SLIME_PROBE_SHAPE")
    if shp:   # "L,I,H" — H is the UNPACKED minor dim (stored as H/2 packed)
        L, I, H = (int(x) for x in shp.split(","))
    group = 128
    bi = 256 if tiny else int(os.environ.get("SLIME_PROBE_BLOCK", "1024"))
    rng = np.random.default_rng(0)
    print("uploading packed stack...", file=sys.stderr, flush=True)
    packed = jnp.asarray(rng.integers(0, 256, (L, I, H // 2),
                                      dtype=np.int16).astype(np.uint8)
                         .view(np.int8))
    h = jnp.asarray(rng.standard_normal((1, H)) * 0.1, jnp.bfloat16)
    gb = packed.size / 1e9

    def kern(x_ref, p_ref, o_ref, *, mode):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _init():
            o_ref[...] = jnp.zeros_like(o_ref)

        blk = p_ref[0]                                    # [bi, H/2]
        if mode == "dma":
            s = jnp.sum(blk.astype(jnp.int32)).astype(jnp.float32)
            o_ref[...] += jnp.full((8, 128), s, jnp.float32)
        elif mode == "unpack":
            acc = jnp.zeros((), jnp.float32)
            for b in range(blk.shape[-1] // group):
                lo, hi = _unpack_nibbles(
                    blk[:, b * group:(b + 1) * group], jnp.bfloat16,
                    shift=True)
                acc += (jnp.sum(lo.astype(jnp.float32))
                        + jnp.sum(hi.astype(jnp.float32)))
            o_ref[...] += jnp.full((8, 128), acc, jnp.float32)
        else:                                             # unpack_dot
            x = x_ref[...].astype(jnp.bfloat16)           # [1, H]
            acc = None
            for b in range(blk.shape[-1] // group):
                lo, hi = _unpack_nibbles(
                    blk[:, b * group:(b + 1) * group], jnp.bfloat16,
                    shift=True)
                for j, w in ((0, lo), (1, hi)):
                    g_i = 2 * b + j
                    xg = x[:, g_i * group:(g_i + 1) * group]
                    y = jax.lax.dot_general(
                        xg, w, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = y if acc is None else acc + y
            if acc.shape[-1] >= 8 * 128:
                o_ref[...] += acc[0, :8 * 128].reshape(8, 128)
            else:
                o_ref[...] += jnp.full((8, 128), jnp.sum(acc), jnp.float32)

    def run(mode):
        grid = (L * (I // bi),)
        f = pl.pallas_call(
            functools.partial(kern, mode=mode),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, H), lambda c: (0, 0)),
                    pl.BlockSpec((1, bi, H // 2),
                                 lambda c: (c // (I // bi), c % (I // bi), 0)),
                ],
                out_specs=pl.BlockSpec((8, 128), lambda c: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )
        # N sweeps inside ONE dispatch: tunnel/dispatch latency would
        # otherwise dominate (a single 0.94 GB sweep is ~3 ms at full rate
        # vs ~25 ms of host round-trip). Perturb x per iteration so XLA
        # cannot CSE the identical pallas_calls.
        N = 2 if tiny else 16

        def sweep(x, p):
            # close over the jit ARGUMENTS, not the host arrays — a closed-
            # over device array becomes a baked-in jaxpr constant (0.94 GB
            # through the constant folder)
            def body(i, acc):
                xi = x * (1.0 + 1e-9 * i.astype(jnp.float32))
                return acc + f(xi, p)[0, 0]
            return jax.lax.fori_loop(0, N, body, 0.0)

        jf = jax.jit(sweep)
        t0 = time.perf_counter()
        float(jf(h, packed))
        print(f"  {mode}: compile+run {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(jf(h, packed))
            best = min(best, (time.perf_counter() - t0) / N)
        return best

    res = {}
    for mode in ("dma", "unpack", "unpack_dot"):
        dt = run(mode)
        res[mode] = dt
        print(json.dumps({
            "metric": f"q4g_probe_{mode}_b{bi}",
            "value": round(dt * 1e3, 2),
            "unit": f"ms for {gb:.2f} GB packed ({gb / dt:.0f} GB/s effective)",
        }), flush=True)
    print(json.dumps({
        "metric": "q4g_probe_unpack_overhead",
        "value": round((res["unpack"] - res["dma"]) * 1e3, 2),
        "unit": (f"ms VPU unpack cost per {gb:.2f} GB packed "
                 f"(dot adds {1e3 * (res['unpack_dot'] - res['unpack']):.2f}"
                 " ms)"),
    }), flush=True)


if __name__ == "__main__":
    main()
