"""Fused whole-MLP Pallas kernel for the decode hot loop.

One ``pallas_call`` computes ``x + down(silu(gate(h)) * up(h))`` with
``h = rms_norm(x)`` — the entire SwiGLU block of one transformer layer — by
chunking the intermediate dimension: grid step ``c`` streams gate/up rows
``[c*bi, (c+1)*bi)`` and the matching down *columns*, so the three weight
streams advance in lockstep and Mosaic's automatic block pipeline keeps HBM
busy for the whole layer instead of per-matmul bursts.

Why this exists (measured, STATUS.md): the decode scan feeds per-layer weight
slices to each op. XLA's own int8 dequant-matmul reads those slices in place
(~640 GB/s in-scan), but a pallas_call is a custom call — XLA materializes a
contiguous COPY of every sliced operand first, so the per-matmul int4 kernel
paid read+write+read (~3x traffic, ~215 GB/s effective: int4 decoded *slower*
than int8). This kernel therefore takes the FULL pre-stacked [L, ...] weight
arrays and picks the layer with a scalar-prefetch index: the operands are the
unsliced buffers (nothing to copy), and the layer index only changes which
blocks the pipeline fetches.

The MLP is 81% of an 8B layer's weight bytes; fusing it (plus norm, silu,
residual) also removes the elementwise HLOs between matmuls that each cost a
kernel-boundary HBM round trip for the [B, I] activations.

Weight formats (matching ops/quantization.py storage):
  - bf16/fp32: plain ``{"weight": [L, out, in]}``
  - int8:      ``{"weight": {"q": [L, out, in] i8, "scale": [L, out, 1]}}``
  - int4 q4g:  ``{"weight": {"q4g": [L, out, in//2] i8, "scale": [L, out, in//128]}}``
    (group-128 absmax; packed lane block b holds group 2b in low nibbles,
    2b+1 in high — every kernel slice stays lane-aligned, see
    ops/quantization.py). For the down projection the per-group scales vary
    along the contraction; Mosaic's VMEM tiling rejects a [H, groups-chunk]
    block (last dim neither 128-aligned nor spanning), so the kernel takes
    them TRANSPOSED [L, in//128, out] — ``prepare_fused_layers`` does this
    once at load time.

Reference role: this replaces HF's LlamaMLP + bitsandbytes Linear8bitLt/4bit
compute (the reference runs HF + bnb, llava/model/builder.py:32-41); the
TPU-native form is one VMEM-resident fused stream.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _unpack_nibbles(pg, dtype, *, shift: bool):
    """One packed lane block [n, group] -> (lo, hi) signed values in ``dtype``.

    ``shift``: sign-extend via (p << 28) >> 28 / (p << 24) >> 28 — 7 VPU ops
    per packed byte vs the xor-sub form's 10 (widen + and/xor/sub x2 + shr +
    2 casts). Both are int32-formulated; int8/int16 unpacks crash Mosaic
    (STATUS r2). Identical values by construction (two's-complement nibble).
    """
    p = pg.astype(jnp.int32)
    if shift:
        lo = ((p << 28) >> 28).astype(dtype)
        hi = ((p << 24) >> 28).astype(dtype)
    else:
        lo = (((p & 0xF) ^ 8) - 8).astype(dtype)
        hi = ((((p >> 4) & 0xF) ^ 8) - 8).astype(dtype)
    return lo, hi


def _unpack_q4g(pblk, dtype, group: int):
    """[n, k/2] packed q4g -> [n, k] values (grouped order), unscaled.

    Packed lane block b holds group 2b in its low nibbles and group 2b+1 in
    its high nibbles; output keeps that order: [g0 | g1 | g2 | ...].
    int32 is the only nibble-unpack formulation Mosaic compiles (STATUS r2).
    Kept for tests/ad-hoc use; the hot kernels go through ``_q4g_contract``.
    """
    p = pblk.astype(jnp.int32)
    lo = (((p & 0xF) ^ 8) - 8).astype(dtype)
    hi = ((((p >> 4) & 0xF) ^ 8) - 8).astype(dtype)
    n_blocks = p.shape[-1] // group
    cols = []
    for b in range(n_blocks):
        cols.append(lo[:, b * group:(b + 1) * group])
        cols.append(hi[:, b * group:(b + 1) * group])
    return jnp.concatenate(cols, axis=-1)


def _q4g_deq_into(ref, pblk, scale_of, group: int, dt):
    """Dequantize a packed q4g block into a VMEM scratch ref, scales folded.

    ``ref[:, g*group:(g+1)*group] = nibble(g) * scale_of(g)[:, None]`` for
    every group g — after this, ONE plain MXU dot over the full contraction
    replaces the per-group partial-sum dots (variant "deq"). The product
    nibble*scale rounds to ``dt`` (bf16): ≤2^-9 relative, half a ulp of the
    4-bit quantization step itself (1/15), i.e. far below quantization noise
    — see the variant-parity test's tolerances.
    """
    for b in range(pblk.shape[-1] // group):
        lo, hi = _unpack_nibbles(pblk[:, b * group:(b + 1) * group], dt,
                                 shift=True)
        for j, w in ((0, lo), (1, hi)):
            g_i = 2 * b + j
            # minor-dim insertion must happen on the fp32 vector: Mosaic only
            # supports non-no-op minor-dim insertion for 32-bit types
            s = scale_of(g_i)[:, None].astype(dt)
            ref[:, g_i * group:(g_i + 1) * group] = w * s


def q4g_variant() -> str:
    """Active q4g contraction variant (trace-time; see ``_q4g_contract``).

    Values: "whole" (r4 shipped: unpack the full weight block, slice after),
    "lane" (slice the packed block per 128-lane block, unpack just the slice
    — quant_matmul_q4g's structure), with an optional "_shift" suffix for the
    shift-based sign extension; "bias" (two-dot linear unpack: the nibble
    shifts move into the MXU via dot linearity — see ``_q4g_contract``);
    "deq" (dequant-to-VMEM-scratch with scales folded, ONE full-contraction
    dot per matmul — see ``_q4g_deq_into``); "fake" (BENCH-ONLY, wrong
    values: no unpack at all, measures the no-unpack ceiling of the
    group-dot structure). Swept on chip in scripts/bench_q4g_sweep.py;
    the default is the measured winner.
    """
    return os.environ.get("SLIME_Q4G_VARIANT", "lane_shift")


def _q4g_contract(h, pblk, scale_of, group: int, dt, variant: str):
    """h [B, K] · dequant(packed [n, K/2]).T -> [B, n] fp32.

    Per-group MXU dots with the group scale applied on each partial sum
    (q4g scales vary along the contraction, so they cannot commute past one
    big dot). ``scale_of(g)`` returns group ``g``'s [n] per-row scale vector
    (callers orient their scale storage differently — see fused_mlp down-proj
    vs gate/up). ``variant`` picks the unpack structure (q4g_variant())."""
    shift = variant.endswith("shift")
    if variant == "bias":
        # Two-dot linear unpack: per packed 128-lane block, bias the low
        # nibble (u = (p & 0xF) ^ 8 = n_lo + 8, an identity of two's
        # complement) and keep the byte itself (p' = p ^ 8 = 16*n_hi + u).
        # Then with ONE stacked dot d_u = [h_lo; h_hi] @ u.T and one dot
        # d_p = h_hi @ p'.T:
        #     y_lo = (d_u[0] - 8*sum(h_lo)) * s_lo
        #     y_hi = (d_p - d_u[1]) * s_hi / 16
        # Same two weight-streaming dots as lane/_shift but the VPU unpack
        # drops from 7 int32 ops/byte (4 shifts + widen + 2 casts) to 5
        # (widen, xor, and, 2 casts) — the shifts move into the MXU via
        # linearity. fp note: d_p - d_u[1] = 16*(h_hi @ n_hi.T) EXACTLY in
        # fp32 when |h| < ~2^116 (both dots accumulate fp32; products are
        # exact bf16*int products), so this is not a numerics trade.
        acc = None
        B = h.shape[0]
        for b in range(pblk.shape[-1] // group):
            p = pblk[:, b * group:(b + 1) * group].astype(jnp.int32) ^ 8
            u = (p & 0xF).astype(dt)
            pv = p.astype(dt)
            h2 = jnp.concatenate(
                [h[:, (2 * b) * group:(2 * b + 1) * group],
                 h[:, (2 * b + 1) * group:(2 * b + 2) * group]], axis=0)
            du = jax.lax.dot_general(h2, u, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                h2[B:], pv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            sig = jnp.sum(h[:, (2 * b) * group:(2 * b + 1) * group]
                          .astype(jnp.float32), axis=-1, keepdims=True)
            y_lo = (du[:B] - 8.0 * sig) * scale_of(2 * b)[None, :]
            y_hi = (dp - du[B:]) * (scale_of(2 * b + 1)[None, :]
                                    * (1.0 / 16.0))
            y = y_lo + y_hi
            acc = y if acc is None else acc + y
        return acc
    if variant == "fake":
        # BENCH-ONLY (wrong values): feeds the packed bytes straight to the
        # group dots — same DMA traffic, same dot/scale count, NO nibble
        # unpack. The tok/s gap between this and lane_shift measures exactly
        # what the VPU unpack costs in the full pipeline (the no-unpack
        # ceiling of this kernel structure). Never selected by production
        # code; only bench_q4g_sweep.py sets SLIME_Q4G_VARIANT=fake.
        acc = None
        for b in range(pblk.shape[-1] // group):
            w = pblk[:, b * group:(b + 1) * group].astype(dt)
            for j in (0, 1):
                g_i = 2 * b + j
                hg = h[:, g_i * group:(g_i + 1) * group]
                y = jax.lax.dot_general(hg, w, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                y = y * scale_of(g_i)[None, :]
                acc = y if acc is None else acc + y
        return acc
    if variant.startswith("whole"):
        w = _unpack_q4g(pblk, dt, group)
        acc = None
        for g_i in range(2 * (pblk.shape[-1] // group)):
            hg = h[:, g_i * group:(g_i + 1) * group]
            wg = w[:, g_i * group:(g_i + 1) * group]
            y = jax.lax.dot_general(hg, wg, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = (y * scale_of(g_i)[None, :] if acc is None
                   else acc + y * scale_of(g_i)[None, :])
        return acc
    acc = None
    for b in range(pblk.shape[-1] // group):
        lo, hi = _unpack_nibbles(pblk[:, b * group:(b + 1) * group], dt,
                                 shift=shift)
        for j, w in ((0, lo), (1, hi)):
            g_i = 2 * b + j
            hg = h[:, g_i * group:(g_i + 1) * group]
            y = jax.lax.dot_general(hg, w, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            y = y * scale_of(g_i)[None, :]
            acc = y if acc is None else acc + y
    return acc


def _kernel(l_ref, x_ref, nw_ref, g_ref, gs_ref, u_ref, us_ref, d_ref, ds_ref,
            o_ref, h_ref, acc_ref, *deq_scratch, eps: float, fmt: str,
            group: int, variant: str):
    """Grid step c: one intermediate chunk of the whole SwiGLU block.

    fmt: "bf16" (scale refs are dummies), "int8" (per-row scales, applied on
    the [B, bi] results / at flush — they commute past the dot), or "q4g"
    (group-128 scales along the contraction; per-group partial dots via
    ``_q4g_contract`` in the ``variant`` structure).
    """
    c = pl.program_id(0)
    dt = h_ref.dtype

    @pl.when(c == 0)
    def _prologue():
        xf = x_ref[...].astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        h_ref[...] = (xf * jax.lax.rsqrt(var + eps)
                      * nw_ref[0, 0][None, :]).astype(dt)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    h = h_ref[...]

    if fmt == "q4g" and variant == "deq":
        # dequant-to-scratch: fold scales into bf16 weights in VMEM, then
        # ONE full-contraction MXU dot per matmul. The fake-variant A/B
        # (bench_q4g_sweep, r5) showed the per-group-dot structure — not the
        # VPU unpack — is what pins q4g at ~300 GB/s effective while int8's
        # one-dot-per-block form rides the DMA at ~590: 96 short dots per
        # grid step cost ~2x the step's DMA time at half the bytes.
        # separate gate/up scratches so Mosaic can overlap up's VPU unpack
        # with gate's MXU dot (one shared scratch would serialize them)
        ws_g, ws_u, ws_d = deq_scratch          # [bi, H] x2, [H, bi]
        gs, us = gs_ref[0], us_ref[0]                     # [bi, H/group]
        _q4g_deq_into(ws_g, g_ref[0], lambda i: gs[:, i], group, dt)
        _q4g_deq_into(ws_u, u_ref[0], lambda i: us[:, i], group, dt)
        g = jax.lax.dot_general(h, ws_g[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        u = jax.lax.dot_general(h, ws_u[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        a = (jax.nn.silu(g) * u).astype(dt)               # [B, bi]
        sd = ds_ref[0]                                    # [bi/group, H]
        _q4g_deq_into(ws_d, d_ref[0], lambda i: sd[i], group, dt)
        acc_ref[...] += jax.lax.dot_general(
            a, ws_d[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    elif fmt == "q4g":
        # gate/up contract over H with per-group scales: each 128-lane group
        # gets its own MXU dot; scales land on the [B, bi] partial sums.
        gs, us = gs_ref[0], us_ref[0]                     # [bi, H/group]
        g = _q4g_contract(h, g_ref[0], lambda i: gs[:, i], group, dt, variant)
        u = _q4g_contract(h, u_ref[0], lambda i: us[:, i], group, dt, variant)
        a = (jax.nn.silu(g) * u).astype(dt)               # [B, bi]
        # down contracts over THIS chunk of I: bi/group groups, scaled per
        # (group, out_row) — scales arrive transposed [bi/group, H] so each
        # row is a ready lane vector.
        sd = ds_ref[0]                                    # [bi/group, H]
        acc_ref[...] += _q4g_contract(a, d_ref[0], lambda i: sd[i], group,
                                      dt, variant)
    else:
        wg, wu, wd = g_ref[0].astype(dt), u_ref[0].astype(dt), d_ref[0].astype(dt)
        g = jax.lax.dot_general(h, wg, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        u = jax.lax.dot_general(h, wu, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if fmt == "int8":   # per-out-row scales commute past the dot
            g = g * gs_ref[0, :, 0][None, :]
            u = u * us_ref[0, :, 0][None, :]
        a = (jax.nn.silu(g) * u).astype(dt)               # [B, bi]
        acc_ref[...] += jax.lax.dot_general(
            a, wd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [B, H]

    @pl.when(c == pl.num_programs(0) - 1)
    def _flush():
        acc = acc_ref[...]
        if fmt == "int8":
            acc = acc * ds_ref[0, :, 0][None, :]          # down per-row scale
        o_ref[...] = (x_ref[...].astype(jnp.float32) + acc).astype(o_ref.dtype)


def _fmt_of(w) -> str:
    if isinstance(w, dict):
        return "q4g" if "q4g" in w else "int8"
    return "bf16"


def prepare_fused_layers(layers: dict) -> dict:
    """One-time (outside-jit) layout prep for ``fused_mlp_decode``: q4g down
    scales transpose to [L, in/group, out]. Other formats pass through."""
    dw = layers["down_proj"]["weight"]
    if isinstance(dw, dict) and "q4g" in dw:
        I2 = dw["q4g"].shape[-1]
        if dw["scale"].shape[-1] != dw["q4g"].shape[-2]:  # not yet transposed
            out = dict(layers)
            out["down_proj"] = {"weight": {
                "q4g": dw["q4g"],
                "scale": jnp.swapaxes(dw["scale"], -1, -2),
            }}
            return out
        del I2
    return layers


# preferred intermediate chunk per weight format (VMEM-sized for 8B width);
# q4g overridable at trace time for the on-chip sweep (bench_q4g_sweep.py)
# q4g: 1024 beat 2048 on chip for every variant (75.4 vs 69.9 tok/s at 8B
# with lane_shift — scripts/bench_q4g_sweep.py, r5); smaller chunks double-
# buffer better against the unpack+dot pipeline.
_PREFERRED_BLOCK = {"bf16": 512, "int8": 1024, "q4g": 1024}


def _q4g_block() -> int:
    return int(os.environ.get("SLIME_Q4G_BLOCK", "0")) or _PREFERRED_BLOCK["q4g"]


def auto_block_ok(layers) -> bool:
    """True when the MLP's intermediate dim tiles cleanly at the preferred
    chunk size — the condition for the fused kernel to be an AUTO win.

    Intermediates like 5504 = 43*128 only admit a degenerate 128-wide
    fallback chunk (43 tiny grid steps, pipeline-bound: measured ~4x slower
    than the XLA path on a 0.6B draft). Explicit ``fused=True`` callers still
    run via the fallback; auto-gating should prefer XLA instead."""
    gw = layers["gate_proj"]["weight"]
    fmt = _fmt_of(gw)
    gq = gw if fmt == "bf16" else gw.get("q4g", gw.get("q"))
    I = gq.shape[1]
    if fmt == "q4g":
        # mirror fused_mlp_decode's q4g chunking: legal chunks are multiples
        # of 8*group (scale-block tiling), else a single full-I chunk whose
        # VMEM footprint only works for dims near the preferred block
        want = _q4g_block()
        return _block_divisor(I, want, step=1024) >= min(I, want) // 2
    want = _PREFERRED_BLOCK[fmt]
    return _block_divisor(I, want) >= min(I, want) // 2


def _block_divisor(I: int, want: int, *, step: int = 128) -> int:
    """Largest multiple of ``step`` that divides I, at most ``want``.

    The down-proj grid slices the intermediate dim into chunks of ``bi``, so
    bi must divide I exactly (Llama intermediates like 5504 = 43*128 are NOT
    divisible by the preferred 512/1024 blocks). Falls back to I itself when
    no step-multiple divides it (then the kernel runs single-chunk)."""
    bi = min(want, I)
    bi -= bi % step
    while bi >= step and I % bi:
        bi -= step
    return bi if bi >= step and I % bi == 0 else I


def fused_mlp_decode(x, layers, layer_idx, *, eps: float = 1e-5,
                     block_inter: int = 0, interpret: bool = False):
    """x [B, H] -> x + SwiGLU(rms_norm(x)) for layer ``layer_idx``.

    ``layers`` is the pre-stacked params["layers"] dict (stack_layers layout,
    run through ``prepare_fused_layers`` for q4g); only
    post_attention_layernorm / gate_proj / up_proj / down_proj are read.
    The full stacked arrays are kernel operands — layer selection happens in
    the BlockSpec index maps via scalar prefetch, so no per-layer slice (and
    therefore no XLA operand copy) ever materializes.
    """
    nw = layers["post_attention_layernorm"]["weight"]     # [L, H]
    gw = layers["gate_proj"]["weight"]
    uw = layers["up_proj"]["weight"]
    dw = layers["down_proj"]["weight"]
    fmt = _fmt_of(gw)
    assert _fmt_of(uw) == fmt and _fmt_of(dw) == fmt, "mixed MLP formats"
    B, H = x.shape

    if fmt == "bf16":
        L, I = gw.shape[0], gw.shape[1]
        bi = _block_divisor(I, block_inter or 512)
        gq, uq, dq = gw, uw, dw
        gs = us = ds = jnp.zeros((1, 1, 1), jnp.float32)  # dummies
        group = 0
        g_spec = pl.BlockSpec((1, bi, H), lambda c, l: (l[0], c, 0))
        d_spec = pl.BlockSpec((1, H, bi), lambda c, l: (l[0], 0, c))
        gs_spec = ds_spec = pl.BlockSpec((1, 1, 1), lambda c, l: (0, 0, 0))
    elif fmt == "int8":
        gq, uq, dq = gw["q"], uw["q"], dw["q"]
        gs, us, ds = (gw["scale"].astype(jnp.float32),
                      uw["scale"].astype(jnp.float32),
                      dw["scale"].astype(jnp.float32))
        assert gs.shape[-1] == 1, "int8 fused MLP expects per-row scales"
        L, I = gq.shape[0], gq.shape[1]
        bi = _block_divisor(I, block_inter or 1024)
        group = 0
        g_spec = pl.BlockSpec((1, bi, H), lambda c, l: (l[0], c, 0))
        d_spec = pl.BlockSpec((1, H, bi), lambda c, l: (l[0], 0, c))
        gs_spec = pl.BlockSpec((1, bi, 1), lambda c, l: (l[0], c, 0))
        ds_spec = pl.BlockSpec((1, H, 1), lambda c, l: (l[0], 0, 0))
    else:  # q4g
        gq, uq, dq = gw["q4g"], uw["q4g"], dw["q4g"]
        gs, us = (gw["scale"].astype(jnp.float32),
                  uw["scale"].astype(jnp.float32))
        ds = dw["scale"].astype(jnp.float32)
        L, I = gq.shape[0], gq.shape[1]
        group = 2 * gq.shape[-1] // gs.shape[-1]
        if ds.shape[-1] != H:
            # tests / ad-hoc callers: transpose in-graph (prepare_fused_layers
            # does this once, outside jit, for the production path)
            ds = jnp.swapaxes(ds, -1, -2)
        # the transposed down-scale block is [1, bi/group, H]: Pallas needs
        # its second-to-last dim divisible by 8 (or == I/group), so legal
        # chunks are multiples of 8*group (1024 at group=128)
        bi = _block_divisor(I, block_inter or _q4g_block(), step=8 * group)
        # down chunks slice the PACKED in-dim: each 128-lane packed block
        # carries two groups, so chunks must cover whole packed blocks
        assert bi % (2 * group) == 0, (bi, group)
        g_spec = pl.BlockSpec((1, bi, H // 2), lambda c, l: (l[0], c, 0))
        d_spec = pl.BlockSpec((1, H, bi // 2), lambda c, l: (l[0], 0, c))
        gs_spec = pl.BlockSpec((1, bi, H // group), lambda c, l: (l[0], c, 0))
        ds_spec = pl.BlockSpec((1, bi // group, H), lambda c, l: (l[0], c, 0))

    assert I % bi == 0, (I, bi)
    grid = (I // bi,)
    lidx = jnp.asarray([layer_idx], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, H), lambda c, l: (0, 0)),            # x
            # norm w travels as [L, 1, H]: a (1, H) block of [L, H] violates
            # Mosaic's last-two-dims rule on hardware (1 ∤ 8, 1 != L)
            pl.BlockSpec((1, 1, H), lambda c, l: (l[0], 0, 0)),   # norm w
            g_spec, gs_spec,
            g_spec, gs_spec,   # up shares gate's geometry
            d_spec, ds_spec,
        ],
        out_specs=pl.BlockSpec((B, H), lambda c, l: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((B, H), x.dtype),        # h = rms_norm(x)
            pltpu.VMEM((B, H), jnp.float32),    # down-proj accumulator
        ] + ([pltpu.VMEM((bi, H), x.dtype),     # deq: gate weight scratch
              pltpu.VMEM((bi, H), x.dtype),     # deq: up weight scratch
              pltpu.VMEM((H, bi), x.dtype)]     # deq: down weight scratch
             if fmt == "q4g" and q4g_variant() == "deq" else []),
    )
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, fmt=fmt, group=group,
                          variant=q4g_variant()),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # three double-buffered weight blocks/step (~24 MB at bi=1024,
            # 8B width) exceed the 16 MB default scoped-VMEM budget; v5e has
            # 128 MB — big blocks are the point of the whole-layer stream
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lidx, x, nw.astype(jnp.float32).reshape(nw.shape[0], 1, H),
      gq, gs, uq, us, dq, ds)
