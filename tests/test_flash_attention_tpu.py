"""Compiled-mode Pallas flash attention parity on real TPU hardware.

The interpret-mode tests in test_flash_attention.py cannot catch Mosaic
compilation hazards — in particular the lse output block revisit pattern
(ops/flash_attention.py grid order: heads must revisit the per-(b, i) lse block
consecutively or compiled TPU Pallas drops the VMEM-resident partial writes).
This test jits the real kernel on the chip and checks fwd + all three grads
against the XLA oracle, with multiple heads and multiple q/k tiles so a
cross-head lse corruption would show up as O(1) error.

Runs in a subprocess with the test harness's forced-CPU env stripped; skipped
when no TPU is reachable. Marked slow (one-chip compile is ~30 s).
"""
import json
import os
import subprocess
import sys

import pytest

_CHILD = r"""
import json
import numpy as np
import jax
import jax.numpy as jnp

if jax.default_backend() != "tpu":
    print(json.dumps({"skip": "no tpu"}))
    raise SystemExit(0)

from slime_tpu.ops.flash_attention import flash_attention, reference_attention

B, H, KVH, S, D = 1, 8, 4, 2048, 128
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))
k = jnp.asarray(rng.standard_normal((B, KVH, S, D)).astype(np.float32))
v = jnp.asarray(rng.standard_normal((B, KVH, S, D)).astype(np.float32))

kw = dict(causal=True, use_pallas=True, block_q=512, block_k=512)

def loss_p(q, k, v):
    return jnp.sum(jnp.tanh(flash_attention(q, k, v, **kw)))

def loss_r(q, k, v):
    return jnp.sum(jnp.tanh(reference_attention(q, k, v, causal=True)))

op = jax.jit(lambda q, k, v: flash_attention(q, k, v, **kw))(q, k, v)
orf = jax.jit(lambda q, k, v: reference_attention(q, k, v, causal=True))(q, k, v)
errs = {"fwd": float(jnp.max(jnp.abs(op - orf)))}
gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(q, k, v)
gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(q, k, v)
for name, a, b in zip("qkv", gp, gr):
    errs["d" + name] = float(jnp.max(jnp.abs(a - b)))
print(json.dumps(errs))
"""


@pytest.mark.slow
def test_compiled_tpu_fwd_bwd_parity():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run([sys.executable, "-c", _CHILD], capture_output=True,
                       text=True, timeout=560, env=env,
                       cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    if "skip" in out:
        pytest.skip("no TPU reachable")
    # bf16-MXU multiply noise at S=2048 is ~1e-2; cross-head lse corruption
    # (the bug class this guards) produces O(1) error.
    for name, err in out.items():
        assert err < 0.05, (name, err, out)
