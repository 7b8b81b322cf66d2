"""The fused on-device loop must serve top-k/top-p and per-request stop
tokens natively (round-1 gap: any filtered request silently dropped the
whole engine to the per-round overlap path)."""

import jax
import numpy as np
import pytest

from helpers import tiny_pearl_config
from nano_pearl_tpu import PearlEngine
from nano_pearl_tpu.config import SamplingParams

PROMPT = [1, 2, 3, 4, 5]


def _no_overlap_rounds(engine, monkeypatch):
    """Fail the test if the engine falls back to the per-round path."""
    def boom(*a, **k):
        raise AssertionError("fused engine fell back to pearl_round")

    monkeypatch.setattr(engine.orchestrator, "pearl_round", boom)


def _fused_engine(**kw):
    # both groups on one device: the fused whole-loop program applies
    # (tiny_pearl_config on the 8-device CPU mesh is disjoint -> overlap)
    return PearlEngine(tiny_pearl_config(devices=[jax.devices()[0]]), **kw)


def test_fused_serves_topk_topp(monkeypatch):
    eng = _fused_engine()
    assert eng.orchestrator.fused is not None
    _no_overlap_rounds(eng, monkeypatch)
    eng.add_request(
        PROMPT,
        SamplingParams(temperature=0.8, top_k=7, top_p=0.9, max_tokens=12, ignore_eos=True),
    )
    out, n, _, _ = eng.generate_token_ids()
    assert n == [12]


def test_fused_topk1_equals_greedy(monkeypatch):
    """top_k=1 at T>0 collapses sampling to argmax IF the filter is
    actually applied inside the fused program — compare against greedy
    AR over the same horizon."""
    eng = _fused_engine()
    _no_overlap_rounds(eng, monkeypatch)
    eng.add_request(
        PROMPT,
        SamplingParams(temperature=1.0, top_k=1, max_tokens=16, ignore_eos=True),
    )
    filtered, _, _, _ = eng.generate_token_ids()
    eng.add_request(
        PROMPT, SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    )
    ar, _, _, _ = eng.AR_generate_token_ids()
    assert filtered == ar


def test_fused_stop_tokens_match_overlap(monkeypatch):
    """Per-request stops at T=0 are deterministic: the fused engine must
    produce exactly what the overlap engine produces."""
    fused = _fused_engine()
    overlap = PearlEngine(
        tiny_pearl_config(execution_mode="overlap"),
        draft_params=fused.draft.params,
        target_params=fused.target.params,
    )
    assert overlap.orchestrator.fused is None

    # find a token the greedy stream actually emits so the stop triggers
    fused.add_request(PROMPT, SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True))
    ref, _, _, _ = fused.generate_token_ids()
    stop_tok = ref[0][len(ref[0]) // 2]

    sp = SamplingParams(temperature=0.0, max_tokens=24, stop_token_ids=(int(stop_tok),))
    _no_overlap_rounds(fused, monkeypatch)
    fused.add_request(PROMPT, sp)
    got_f, _, _, _ = fused.generate_token_ids()
    overlap.add_request(PROMPT, sp)
    got_o, _, _, _ = overlap.generate_token_ids()
    assert got_f == got_o
    assert got_f[0][-1] == stop_tok


def test_fused_mixed_filtered_batch(monkeypatch):
    """Filtered and unfiltered rows coexist in one fused batch; the
    unfiltered greedy row must still match solo greedy AR."""
    eng = _fused_engine()
    _no_overlap_rounds(eng, monkeypatch)
    eng.add_request(PROMPT, SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True))
    eng.add_request(
        [7, 8, 9],
        SamplingParams(temperature=0.9, top_p=0.8, max_tokens=10, ignore_eos=True),
    )
    out, n, _, _ = eng.generate_token_ids()
    assert n == [10, 10]
    eng.add_request(PROMPT, SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True))
    solo, _, _, _ = eng.AR_generate_token_ids()
    assert out[0] == solo[0]
