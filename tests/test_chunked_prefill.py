"""Chunked prefill: prompts longer than max_num_batched_tokens are
admitted alone and prefilled in block-aligned chunk passes
(engine/pearl.py _drain_oversized). The reference cannot admit such
prompts at all (scheduler.py:39 + the single prefill() call per
generate); outputs here must be bit-identical to an engine with an
unconstrained token budget.
"""

from __future__ import annotations

import numpy as np

from nano_pearl_tpu.config import SamplingParams
from nano_pearl_tpu.engine.engine import PearlEngine

from helpers import tiny_pearl_config


def _prompt(n, seed=7):
    rng = np.random.default_rng(seed)
    return [int(t) for t in rng.integers(1, 250, size=n)]


def _cfg(budget):
    # block_size 16; budget 48 -> 3-block chunks; prompt 150 -> passes of
    # 48/48/48 + a 6-token sampling pass.
    return tiny_pearl_config(
        max_num_batched_tokens=budget,
        max_model_len=256,
        prefill_token_buckets=(32, 64, 128, 256),
    )


def test_chunked_prefill_matches_unchunked():
    prompt = _prompt(150)
    outs = {}
    for budget in (512, 48):
        eng = PearlEngine(_cfg(budget))
        eng.add_request(prompt, SamplingParams(temperature=0.0, max_tokens=24))
        pearl, _, _, _ = eng.generate_token_ids()
        eng.add_request(prompt, SamplingParams(temperature=0.0, max_tokens=24))
        ar, _, _, _ = eng.AR_generate_token_ids()
        assert pearl == ar, f"PEARL != AR at T=0 (budget={budget})"
        outs[budget] = pearl
    assert outs[48] == outs[512], "chunked prefill changed the output"


def test_chunked_prefill_mixed_batch():
    """An oversized prompt shares the engine with small ones: the
    scheduler admits it alone, the others batch normally, and every
    output matches the unconstrained engine."""
    prompts = [_prompt(150, seed=1), _prompt(20, seed=2), _prompt(9, seed=3)]
    outs = {}
    for budget in (512, 48):
        eng = PearlEngine(_cfg(budget))
        for p in prompts:
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=16))
        res, _, _, _ = eng.generate_token_ids()
        outs[budget] = res
    assert outs[48] == outs[512]


def test_chunked_prefill_with_prefix_cache():
    """A second request sharing the oversized prompt's prefix must hit
    the prefix cache and still decode identically."""
    base = _prompt(150, seed=5)
    follow = base[:64] + _prompt(10, seed=6)
    eng = PearlEngine(_cfg(48))
    eng.add_request(base, SamplingParams(temperature=0.0, max_tokens=8))
    first, _, _, _ = eng.generate_token_ids()
    eng.add_request(follow, SamplingParams(temperature=0.0, max_tokens=8))
    second, _, _, _ = eng.generate_token_ids()

    ref = PearlEngine(_cfg(512))
    ref.add_request(follow, SamplingParams(temperature=0.0, max_tokens=8))
    expect, _, _, _ = ref.generate_token_ids()
    assert second == expect


def test_chunked_prefill_non_multiple_budget():
    """Budget not a block multiple (50 vs block 16): a 49-token prompt
    batches normally with a 1-token prompt (49+1 <= 50, and 49 is inside
    the budget even though it exceeds the 48-token chunk), while a
    150-token prompt still drains in chunks."""
    prompts = [_prompt(49, seed=11), _prompt(1, seed=12), _prompt(150, seed=13)]
    outs = {}
    for budget in (512, 50):
        eng = PearlEngine(tiny_pearl_config(
            max_num_batched_tokens=budget, max_model_len=256,
            prefill_token_buckets=(32, 64, 128, 256),
        ))
        for p in prompts:
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=12))
        res, _, _, _ = eng.generate_token_ids()
        outs[budget] = res
    assert outs[50] == outs[512]


def test_chunked_prefill_under_parallelism():
    """Chunk drains under tp and sp: non-first passes take the
    cache-reading fallback on sp meshes (runner.prefill skips the
    prefix-merge path there) — outputs must still match the
    unconstrained-budget engine with the same parallelism."""
    prompt = _prompt(150, seed=21)
    for over in ({"draft_tp": 2, "target_tp": 2},
                 {"draft_sp": 2, "target_sp": 2, "num_kvcache_blocks": 96}):
        outs = {}
        for budget in (512, 48):
            eng = PearlEngine(tiny_pearl_config(
                max_num_batched_tokens=budget, max_model_len=256,
                prefill_token_buckets=(32, 64, 128, 256), **over,
            ))
            eng.add_request(prompt, SamplingParams(temperature=0.0, max_tokens=12))
            res, _, _, _ = eng.generate_token_ids()
            outs[budget] = res
            del eng
        assert outs[48] == outs[512], f"chunked != unchunked under {over}"
