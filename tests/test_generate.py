"""Generation loop tests: greedy decode vs naive re-forward oracle; sampling
determinism; EOS handling; multimodal prefill path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slime_tpu import generate as gen
from slime_tpu.config import SliMEConfig
from slime_tpu.constants import IMAGE_TOKEN_INDEX
from slime_tpu.models import llama, slime


@pytest.fixture(scope="module")
def tiny():
    cfg = SliMEConfig.tiny()
    params = slime.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_greedy_matches_full_forward(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(1)
    ids = rng.integers(5, cfg.llm.vocab_size, (2, 6)).astype(np.int32)
    mask = np.ones_like(ids, bool)
    toks = gen.generate(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                        max_new_tokens=5, eos_id=-1)
    toks = np.asarray(toks)

    # oracle: repeatedly run the full forward and take argmax
    seq = ids.copy()
    for t in range(5):
        logits, _ = llama.forward(params["llm"],
                                  llama.embed(params["llm"], jnp.asarray(seq)),
                                  cfg.llm)
        nxt = np.argmax(np.asarray(logits)[:, -1], axis=-1)
        np.testing.assert_array_equal(toks[:, t], nxt, err_msg=f"step {t}")
        seq = np.concatenate([seq, nxt[:, None].astype(np.int32)], axis=1)


def test_eos_stops_decoding(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(2)
    ids = rng.integers(5, cfg.llm.vocab_size, (1, 4)).astype(np.int32)
    mask = np.ones_like(ids, bool)
    # force eos to be the first greedy token by finding what it generates
    toks = gen.generate(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                        max_new_tokens=8, eos_id=-1)
    first = int(np.asarray(toks)[0, 0])
    toks2 = gen.generate(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                         max_new_tokens=8, eos_id=first)
    trimmed = gen.trim_at_eos(toks2, first)
    assert trimmed[0] == []  # eos immediately


def test_multimodal_generate_runs(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(3)
    t = cfg.vision.image_size
    MC = 1 + cfg.max_local_crops
    ids = rng.integers(5, cfg.llm.vocab_size, (2, 8)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    mask = np.ones_like(ids, bool)
    pix = rng.standard_normal((2, MC, 3, t, t)).astype(np.float32)
    cmask = np.zeros((2, MC), bool)
    cmask[:, :4] = True
    toks = gen.generate(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                        jnp.asarray(pix), jnp.asarray(cmask),
                        max_new_tokens=4, eos_id=-1)
    assert np.asarray(toks).shape == (2, 4)
    assert (np.asarray(toks) >= 0).all()


def test_sampling_reproducible(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(4)
    ids = rng.integers(5, cfg.llm.vocab_size, (2, 5)).astype(np.int32)
    mask = np.ones_like(ids, bool)
    kw = dict(max_new_tokens=6, temperature=0.8, top_p=0.9, eos_id=-1)
    t1 = gen.generate(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                      rng=jax.random.PRNGKey(7), **kw)
    t2 = gen.generate(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                      rng=jax.random.PRNGKey(7), **kw)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_top_p_filter():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    # top_p=0.6: only token 0 (cum exclusive 0 < 0.6) and token 1 (0.5 < 0.6) survive
    counts = np.zeros(4)
    for i in range(200):
        t = gen.sample_token(jax.random.PRNGKey(i), logits, temperature=1.0, top_p=0.6)
        counts[int(t[0])] += 1
    assert counts[2] == 0 and counts[3] == 0
    assert counts[0] > 0 and counts[1] > 0


def test_sample_token_top_k(rng):
    import jax
    import jax.numpy as jnp
    from slime_tpu.generate import sample_token

    logits = jnp.asarray(rng.standard_normal((4, 50)).astype(np.float32)) * 3
    top3 = np.argsort(-np.asarray(logits), axis=-1)[:, :3]
    for seed in range(8):
        toks = np.asarray(sample_token(jax.random.PRNGKey(seed), logits,
                                       temperature=1.0, top_k=3))
        for b in range(4):
            assert toks[b] in top3[b]
    # top_k=0 / >=V leaves the distribution unrestricted (smoke)
    t = sample_token(jax.random.PRNGKey(0), logits, temperature=1.0, top_k=0)
    assert t.shape == (4,)


@pytest.mark.slow  # heavy: compile-bound; runs in the full tier (make test)
def test_moe_greedy_matches_full_forward():
    """Mixtral-family decode: the incremental KV-cache decode loop must emit
    the same greedy tokens as repeated full forwards (the MoE router runs per
    decoded token inside decode_step — reference Mixtral serves through the
    same HF generate path as llama, llava_mixtral.py:46)."""
    import dataclasses

    cfg = SliMEConfig.tiny()
    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, num_experts=4,
                                     num_experts_per_tok=2))
    params = slime.init(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(7)
    ids = rng.integers(5, cfg.llm.vocab_size, (2, 6)).astype(np.int32)
    mask = np.ones_like(ids, bool)
    toks = np.asarray(gen.generate(params, cfg, jnp.asarray(ids),
                                   jnp.asarray(mask), max_new_tokens=5,
                                   eos_id=-1))
    seq = ids.copy()
    for t in range(5):
        logits, _ = llama.forward(params["llm"],
                                  llama.embed(params["llm"], jnp.asarray(seq)),
                                  cfg.llm)
        nxt = np.argmax(np.asarray(logits)[:, -1], axis=-1)
        np.testing.assert_array_equal(toks[:, t], nxt, err_msg=f"step {t}")
        seq = np.concatenate([seq, nxt[:, None].astype(np.int32)], axis=1)
