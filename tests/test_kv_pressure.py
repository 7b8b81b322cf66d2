"""Serving under KV pressure: over-submitted engines must preempt and
requeue instead of crashing (round-1 verdict item 6 — the fused paths
used to hard-assert when the pool could not hold a worst-case
reservation)."""

import jax
import pytest

from helpers import tiny_pearl_config
from nano_pearl_tpu import PearlEngine
from nano_pearl_tpu.config import SamplingParams


def sp(n):
    return SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True)


def _tight_config(**kw):
    # 20 blocks x 16 tokens = 320 KV tokens per pool: a handful of
    # requests saturate it, forcing preemption + requeue mid-service
    return tiny_pearl_config(num_kvcache_blocks=20, **kw)


@pytest.mark.parametrize("mode", ["fused", "overlap"])
def test_overcommitted_serving_completes_everything(mode):
    kw = (
        dict(execution_mode="overlap")
        if mode == "overlap"
        else dict(devices=[jax.devices()[0]])
    )
    eng = PearlEngine(_tight_config(**kw))
    ids = [eng.submit([1 + i, 2, 3], sp(24)) for i in range(10)]
    outputs = {}
    for _ in range(600):
        for sid, toks, _ in eng.serve_step(fused_rounds=2):
            outputs[sid] = toks
        if not eng.has_work:
            break
    assert set(outputs) == set(ids)
    assert all(len(t) == 24 for t in outputs.values())


def test_batch_generate_under_pressure_chunked_reservation():
    """Variable-length fused run whose combined KV need exceeds the pool:
    the chunked reservation must stall/reschedule (not assert) and the
    outputs must still equal an unpressured engine's (greedy determinism
    survives preemption + re-prefill)."""
    eng = PearlEngine(_tight_config(devices=[jax.devices()[0]]))
    assert eng.orchestrator.fused is not None
    prompts = [[1, 2, 3], [4, 5, 6], [7, 8, 9], [10, 11, 12]]
    for p in prompts:
        eng.add_request(p, sp(60))
    out, n, _, _ = eng.generate_token_ids()
    assert n == [60] * 4

    roomy = PearlEngine(
        tiny_pearl_config(devices=[jax.devices()[0]]),
        draft_params=eng.draft.params,
        target_params=eng.target.params,
    )
    for p in prompts:
        roomy.add_request(p, sp(60))
    ref, _, _, _ = roomy.generate_token_ids()
    assert out == ref


def test_ar_under_pressure():
    eng = PearlEngine(_tight_config(devices=[jax.devices()[0]]))
    for i in range(6):
        eng.add_request([1 + i, 2, 3], sp(40))
    out, n, _, _ = eng.AR_generate_token_ids()
    assert n == [40] * 6
