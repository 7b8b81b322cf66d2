"""Fused on-device loop vs the per-round overlap orchestrator.

The fused loop (engine/fused.py) compiles the whole multi-round PEARL /
AR loop into one program; these tests pin its outputs to the overlap
path bit-for-bit at T=0 (losslessness transfers: fused == overlap == AR).
"""

import jax
import numpy as np
import pytest

from nano_pearl_tpu import PearlEngine
from nano_pearl_tpu.config import SamplingParams

from helpers import tiny_pearl_config

PROMPTS = [[1, 2, 3, 4, 5], [7, 8, 9], [50, 60]]


def _add(eng, max_tokens=18, ignore_eos=False):
    for p in PROMPTS:
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=max_tokens, ignore_eos=ignore_eos))


@pytest.fixture(scope="module")
def engines():
    dev1 = [jax.devices()[0]]
    fused = PearlEngine(tiny_pearl_config(devices=dev1))
    assert fused.orchestrator.fused is not None
    overlap = PearlEngine(
        tiny_pearl_config(execution_mode="overlap"),
        draft_params=fused.draft.params,
        target_params=fused.target.params,
    )
    assert overlap.orchestrator.fused is None
    return fused, overlap


def test_fused_pearl_matches_overlap(engines):
    fused, overlap = engines
    _add(fused)
    f, fn, facc, _ = fused.generate_token_ids()
    _add(overlap)
    o, on, oacc, _ = overlap.generate_token_ids()
    assert f == o
    # MAT totals must agree too (identical rounds -> identical accept counts)
    assert [round(sum(a), 5) for a in facc] == [round(sum(a), 5) for a in oacc]


def test_fused_pearl_matches_fused_ar(engines):
    fused, _ = engines
    _add(fused)
    p, _, _, _ = fused.generate_token_ids()
    _add(fused)
    a, _, _, _ = fused.AR_generate_token_ids()
    assert p == a


def test_fused_bench_fixed_steps(engines):
    fused, _ = engines
    _add(fused, max_tokens=4)  # bench overrides limits
    out, n, acc, elapsed = fused.bench_generate(num_pearl_steps=7)
    assert len(out) == len(PROMPTS)
    assert all(v >= 7 for v in n)  # nobody finished early
    assert all(len(a) >= 1 for a in acc)


def test_fused_eos_and_max_tokens(engines):
    fused, _ = engines
    fused.add_request([1, 2, 3], SamplingParams(temperature=0.0, max_tokens=5))
    fused.add_request([4, 5, 6], SamplingParams(temperature=0.0, max_tokens=30))
    out, n, _, _ = fused.generate_token_ids()
    assert n[0] <= 5 + fused.config.gamma  # max_tokens honored (accept window slack)
    eos = set(fused.config.eos)
    for toks, lim in zip(out, (5, 30)):
        hits = [i for i, t in enumerate(toks) if t in eos]
        if hits and hits[0] < lim - 1:
            # generation must not continue past a committed EOS by more
            # than the final unverified window
            assert len(toks) - hits[0] <= fused.config.gamma + 1
