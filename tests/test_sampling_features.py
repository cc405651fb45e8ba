"""Per-slot sampling features in the serving engine: top_k, min_p,
repetition/presence/frequency penalties.

Semantics references: HF warper chain (temperature -> top_k -> top_p ->
min_p, generation/logits_process.py), vLLM repetition penalty (prompt +
generated), OpenAI presence/frequency (generated only)."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from slime_tpu.config import SliMEConfig
from slime_tpu.generate import sample_token, sample_token_dynamic
from slime_tpu.models import llama, slime
from slime_tpu.serve.batch_engine import BatchDecodeEngine, Request


@pytest.fixture(scope="module")
def setup():
    cfg = SliMEConfig.tiny()
    params = slime.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _run(eng, req, ticks=80):
    eng.submit(req)
    for _ in range(ticks):
        if eng.tick() == 0 and eng.pending.empty() and eng._admission is None:
            break
    out = []
    while True:
        got = req.out_queue.get(timeout=10)
        if got is None:
            return out
        out.extend(got)


# -------------------------------------------------------------- sampler unit
def test_dynamic_top_k_one_is_greedy():
    rng = jax.random.PRNGKey(0)
    logits = jnp.asarray(np.random.default_rng(0)
                         .standard_normal((4, 64)).astype(np.float32))
    got = sample_token_dynamic(rng, logits,
                               jnp.full((4,), 1.3), jnp.ones((4,)),
                               top_k=jnp.ones((4,)), min_p=jnp.zeros((4,)))
    assert got.tolist() == jnp.argmax(logits, -1).tolist()


def test_dynamic_matches_static_sampler_distribution():
    """Dynamic per-row knobs keep tokens inside the same support set as the
    static sample_token at identical knobs (checked over many draws)."""
    rng0 = np.random.default_rng(1)
    logits_np = rng0.standard_normal((1, 32)).astype(np.float32) * 3
    logits = jnp.asarray(np.repeat(logits_np, 64, axis=0))
    temp, top_p, top_k = 0.9, 0.7, 8
    got = sample_token_dynamic(
        jax.random.PRNGKey(2), logits, jnp.full((64,), temp),
        jnp.full((64,), top_p), top_k=jnp.full((64,), top_k),
        min_p=jnp.zeros((64,)))
    # support set from the static implementation (same filter rules)
    x = logits_np[0] / temp
    order = np.argsort(x)[::-1]
    xk = np.where(x < x[order[top_k - 1]], -np.inf, x)
    p = np.exp(np.sort(xk)[::-1] - xk.max())
    p = p / p.sum()
    keep_n = int(np.sum(np.cumsum(p) - p < top_p))
    support = set(order[:min(keep_n, top_k)].tolist())
    assert set(np.asarray(got).tolist()) <= support


def test_dynamic_min_p_restricts_support():
    rng0 = np.random.default_rng(2)
    logits_np = rng0.standard_normal((32,)).astype(np.float32) * 2
    logits = jnp.asarray(np.repeat(logits_np[None], 128, axis=0))
    got = sample_token_dynamic(
        jax.random.PRNGKey(3), logits, jnp.ones((128,)),
        jnp.ones((128,)), top_k=jnp.zeros((128,)),
        min_p=jnp.full((128,), 0.3))
    p = np.exp(logits_np - logits_np.max())
    p /= p.sum()
    support = set(np.flatnonzero(p >= 0.3 * p.max()).tolist())
    assert set(np.asarray(got).tolist()) <= support and len(support) < 32


# ------------------------------------------------------------- engine level
def test_repetition_penalty_reduces_repeats(setup):
    """A huge repetition penalty at greedy must never emit the same token
    twice (vLLM semantics cover prompt + generated); without it the tiny
    random model repeats freely."""
    cfg, params = setup
    rng = np.random.default_rng(0)
    ids = rng.integers(5, cfg.llm.vocab_size, (8,)).astype(np.int32)
    eng = BatchDecodeEngine(params, cfg, max_slots=2, cache_len=128)
    base = _run(eng, Request(input_ids=ids, max_new_tokens=10))
    pen = _run(eng, Request(input_ids=ids, max_new_tokens=10,
                            repetition_penalty=1e9))
    assert len(set(pen)) == len(pen), pen            # all distinct
    assert not set(pen) & set(ids.tolist())          # prompt excluded
    assert len(pen) == 10
    # sanity: the unpenalized run is NOT all-distinct-and-prompt-free,
    # otherwise this test proves nothing on this model
    assert base != pen


def test_frequency_penalty_engine_matches_reference_math(setup):
    """Greedy + frequency penalty: replay the emitted tokens through
    teacher-forced logits applying the penalty on the host; the engine must
    have picked the same argmax at every step."""
    cfg, params = setup
    rng = np.random.default_rng(1)
    ids = rng.integers(5, cfg.llm.vocab_size, (7,)).astype(np.int32)
    freq, pres = 2.5, 0.7
    eng = BatchDecodeEngine(params, cfg, max_slots=2, cache_len=128)
    got = _run(eng, Request(input_ids=ids, max_new_tokens=8,
                            frequency_penalty=freq, presence_penalty=pres))
    assert len(got) >= 2
    full = np.concatenate([ids, np.asarray(got, np.int32)])
    embeds = llama.embed(params["llm"], jnp.asarray(full[None]))
    logits = np.asarray(llama.forward(params["llm"], embeds,
                                      cfg.llm)[0])[0].astype(np.float64)
    V = cfg.llm.vocab_size
    cnt = np.zeros((V,), np.int64)
    for j, tok in enumerate(got):
        row = logits[len(ids) - 1 + j] - pres * (cnt > 0) - freq * cnt
        assert int(np.argmax(row)) == tok, j
        cnt[tok] += 1


def test_penalty_free_slots_unaffected_by_penalized_neighbor(setup):
    """Identity knobs make a slot's penalty rows no-ops: a penalty-free
    request batched WITH a penalized one emits exactly its solo output."""
    cfg, params = setup
    rng = np.random.default_rng(2)
    ids_a = rng.integers(5, cfg.llm.vocab_size, (9,)).astype(np.int32)
    ids_b = rng.integers(5, cfg.llm.vocab_size, (9,)).astype(np.int32)
    solo = _run(BatchDecodeEngine(params, cfg, max_slots=2, cache_len=128),
                Request(input_ids=ids_a, max_new_tokens=6))
    eng = BatchDecodeEngine(params, cfg, max_slots=2, cache_len=128)
    ra = Request(input_ids=ids_a, max_new_tokens=6)
    rb = Request(input_ids=ids_b, max_new_tokens=8, repetition_penalty=5.0,
                 frequency_penalty=1.0)
    eng.submit(ra)
    eng.submit(rb)
    for _ in range(80):
        if eng.tick() == 0 and eng.pending.empty() and eng._admission is None:
            break
    out_a = []
    while True:
        got = ra.out_queue.get(timeout=10)
        if got is None:
            break
        out_a.extend(got)
    assert out_a == solo


def test_top_k_greedy_equivalence_and_top_k_sampling_support(setup):
    """top_k=1 with temperature sampling must equal greedy end-to-end."""
    cfg, params = setup
    rng = np.random.default_rng(3)
    ids = rng.integers(5, cfg.llm.vocab_size, (8,)).astype(np.int32)

    def run(**kw):
        eng = BatchDecodeEngine(params, cfg, max_slots=2, cache_len=128,
                                seed=11)
        return _run(eng, Request(input_ids=ids, max_new_tokens=7, **kw))

    greedy = run()
    k1 = run(temperature=0.9, top_k=1)
    assert k1 == greedy and len(greedy) >= 1
    # min_p ~ 1.0 keeps only argmax too (prob >= 1.0 * pmax)
    m1 = run(temperature=0.9, min_p=1.0)
    assert m1 == greedy
