"""Continuous batching: mid-flight admission without draining the batch
(the reference's TODO, reference: README.md:110; BASELINE.json north-star
'continuous batching schedules requests across hosts')."""

import pytest

from nano_pearl_tpu import PearlEngine
from nano_pearl_tpu.config import SamplingParams

from helpers import tiny_pearl_config


def sp(n):
    return SamplingParams(temperature=0.0, max_tokens=n)


@pytest.mark.parametrize("mode", ["overlap", "fused"])
def test_mid_flight_admission_matches_batch_outputs(mode):
    import jax

    kw = (
        dict(execution_mode="overlap")
        if mode == "overlap"
        else dict(devices=[jax.devices()[0]])
    )
    eng = PearlEngine(tiny_pearl_config(**kw))
    if mode == "fused":
        assert eng.orchestrator.fused is not None

    # baseline: both requests processed from the start
    eng.add_request([1, 2, 3, 4], sp(20))
    eng.add_request([9, 8, 7], sp(20))
    base, _, _, _ = eng.generate_token_ids()

    # continuous: second request arrives mid-flight
    id_a = eng.submit([1, 2, 3, 4], sp(20))
    outputs = {}
    steps = 0
    injected = False
    while eng.has_work and steps < 200:
        done = eng.serve_step(fused_rounds=2)
        for sid, toks, acc in done:
            outputs[sid] = toks
        steps += 1
        if steps == 2 and not injected:
            injected = True
            id_b = eng.submit([9, 8, 7], sp(20))
    assert injected
    assert set(outputs) == {id_a, id_b}
    # greedy outputs are batch-composition independent: mid-flight joiner
    # must produce the same stream as in the static batch
    assert outputs[id_a] == base[0]
    assert outputs[id_b] == base[1]


def test_serve_drains_and_idles():
    eng = PearlEngine(tiny_pearl_config(execution_mode="overlap"))
    assert eng.serve_step() == []  # no work -> no-op
    eng.submit([5, 6], sp(6))
    got = []
    while eng.has_work:
        got += eng.serve_step()
    assert len(got) == 1
    assert len(got[0][1]) == 6
