"""Top-k / top-p (nucleus) sampling — beyond the reference's
temperature-only sampler (reference: layers/sampler.py). The filter is a
logit transform applied to the sampled distribution AND to the PEARL
accept-test / revise distributions, so speculative decoding stays
consistent with what AR would sample."""

import jax
import jax.numpy as jnp
import numpy as np

from helpers import tiny_model_config, tiny_pearl_config
from nano_pearl_tpu.config import SamplingParams
from nano_pearl_tpu.ops.sampling import NEG_INF, apply_top_k_top_p, sample


def naive_filter(row, k, p, t):
    """Per-row transcription: temperature-scaled softmax, top-k, then the
    minimal nucleus prefix whose mass reaches p (crossing token kept)."""
    order = np.argsort(-row, kind="stable")
    keep = np.zeros(len(row), bool)
    k_eff = k if k > 0 else len(row)
    kept_idx = order[:k_eff]
    if p < 1.0:
        scaled = row[kept_idx] / max(t, 1e-10)
        probs = np.exp(scaled - scaled.max())
        probs = probs / probs.sum()
        cum = np.cumsum(probs)
        n_keep = int(np.searchsorted(cum, p) + 1)
        kept_idx = kept_idx[:n_keep]
    keep[kept_idx] = True
    # value ties at the cutoff keep every equal-valued token (standard)
    thresh = row[kept_idx].min()
    out = np.where(row < thresh, NEG_INF, row)
    return out


def test_apply_top_k_top_p_matches_naive():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(12, 50)).astype(np.float32)
    cases = [(0, 1.0, 1.0), (5, 1.0, 1.0), (0, 0.7, 1.0), (8, 0.5, 0.9), (1, 1.0, 1.0)]
    for k, p, t in cases:
        got = np.asarray(
            apply_top_k_top_p(
                jnp.asarray(logits),
                jnp.full((12,), k, jnp.int32),
                jnp.full((12,), p, jnp.float32),
                jnp.full((12,), t, jnp.float32),
            )
        )
        for i in range(12):
            want = naive_filter(logits[i], k, p, t)
            kept_g = got[i] > NEG_INF / 2
            kept_w = want > NEG_INF / 2
            assert (kept_g == kept_w).all(), (k, p, t, i)
            np.testing.assert_allclose(got[i][kept_g], logits[i][kept_g])


def test_identity_when_disabled():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(4, 32)), jnp.float32)
    out = apply_top_k_top_p(
        logits, jnp.zeros((4,), jnp.int32), jnp.ones((4,), jnp.float32)
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(logits))


def test_mixed_rows_only_filter_their_own():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(2, 40)), jnp.float32)
    out = np.asarray(
        apply_top_k_top_p(
            logits,
            jnp.asarray([3, 0], jnp.int32),
            jnp.asarray([1.0, 1.0], jnp.float32),
        )
    )
    assert (out[0] > NEG_INF / 2).sum() == 3
    assert (out[1] > NEG_INF / 2).sum() == 40


def test_sample_respects_filter():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(6, 64)), jnp.float32)
    tk = jnp.full((6,), 4, jnp.int32)
    tp = jnp.ones((6,), jnp.float32)
    filtered = apply_top_k_top_p(logits, tk, tp)
    allowed = np.asarray(filtered) > NEG_INF / 2
    for seed in range(20):
        toks = np.asarray(
            sample(filtered, jnp.ones((6,), jnp.float32), jax.random.key(seed))
        )
        assert all(allowed[i, toks[i]] for i in range(6))


PROMPTS = [[1, 2, 3, 4, 5], [9, 8, 7], [3, 1, 4, 1, 5, 9]]


def _run(cfg, sp):
    from nano_pearl_tpu import PearlEngine

    eng = PearlEngine(cfg)
    for p in PROMPTS:
        eng.add_request(list(p), sp())
    pearl, *_ = eng.generate_token_ids()
    for p in PROMPTS:
        eng.add_request(list(p), sp())
    ar, *_ = eng.AR_generate_token_ids()
    return pearl, ar


def test_top_k_one_is_greedy_end_to_end():
    """top_k=1 at any temperature collapses the distribution to argmax —
    PEARL, AR and plain greedy must all produce identical streams. This
    exercises the filtered sampler, the filtered accept test, and the
    filtered revise resampling end to end."""
    cfg = tiny_pearl_config(target=tiny_model_config(num_hidden_layers=3))
    pearl_f, ar_f = _run(
        cfg, lambda: SamplingParams(temperature=0.8, max_tokens=16, top_k=1)
    )
    pearl_g, ar_g = _run(cfg, lambda: SamplingParams(temperature=0.0, max_tokens=16))
    assert pearl_f == ar_f == pearl_g == ar_g


def test_top_p_engine_runs_and_matches_ar_seeded():
    """Sampled runs aren't bit-comparable between PEARL and AR (different
    RNG consumption), but both must run under top-p and produce the
    requested lengths."""
    cfg = tiny_pearl_config(target=tiny_model_config(num_hidden_layers=3))
    pearl, ar = _run(
        cfg,
        lambda: SamplingParams(
            temperature=1.0, max_tokens=12, top_p=0.8, top_k=8, ignore_eos=True
        ),
    )
    assert all(len(t) >= 12 for t in pearl)
    assert all(len(t) == 12 for t in ar)
