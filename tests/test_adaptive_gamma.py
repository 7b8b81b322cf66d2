"""Acceptance-adaptive gamma (PearlConfig.gamma == -1, beyond the
reference's speed-ratio-only auto gamma)."""

import numpy as np
import pytest

from nano_pearl_tpu import PearlEngine
from nano_pearl_tpu.config import SamplingParams

from helpers import tiny_model_config, tiny_pearl_config


def test_expected_commit_and_inverse_roundtrip():
    from nano_pearl_tpu.engine.pearl import PearlOrchestrator

    ec = PearlOrchestrator._expected_commit
    assert ec(8, 1.0) == 8.0
    assert abs(ec(8, 0.0) - 1.0) < 1e-9
    assert abs(ec(4, 0.5) - (1 + 0.5 + 0.25 + 0.125)) < 1e-9

    class Stub:
        _expected_commit = staticmethod(ec)

    est = PearlOrchestrator._estimate_p
    for gamma in (4, 8, 14):
        for p in (0.1, 0.5, 0.9, 0.99):
            m = ec(gamma, p)
            assert abs(est(Stub(), m, gamma) - p) < 1e-3, (gamma, p)


def test_adapt_gamma_prefers_small_window_at_low_acceptance():
    """FUSED execution (draft and target sequential on one device set):
    with low acceptance the model must shrink gamma — each extra draft
    step is pure wall time there; at p ~ 1 it must not shrink below the
    speed-ratio seed. (Overlap placements legitimately keep large gamma:
    the draft races concurrently, so extra window is nearly free.)"""
    import jax

    cfg = tiny_pearl_config(gamma=3, devices=[jax.devices()[0]])
    eng = PearlEngine(cfg)
    assert eng.orchestrator.fused is not None
    orch = eng.orchestrator
    orch._speeds = {1: (1000.0, 100.0)}  # draft 10x faster than target
    orch._p_ewma = 0.2  # heavy disagreement
    low = orch._adapt_gamma(10)
    assert low <= 4
    orch._p_ewma = 0.999
    high = orch._adapt_gamma(10)
    assert high >= 10


def test_gamma_auto_lossless_and_adapts():
    """gamma=-1 end-to-end: independently-initialized draft/target (low
    acceptance) must still produce EXACTLY the target's own AR stream at
    T=0, across any adaptive gamma switches mid-run."""
    cfg = tiny_pearl_config(
        draft=tiny_model_config(),
        target=tiny_model_config(num_hidden_layers=3),
        gamma=-1,
        gamma_profile_batches=(2,),
    )
    eng = PearlEngine(cfg)

    def add():
        for i in range(2):
            eng.add_request(
                [1 + i, 2, 3, 4, 5],
                SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True),
            )

    add()
    pearl, _, _, _ = eng.generate_token_ids()
    add()
    ar, _, _, _ = eng.AR_generate_token_ids()
    assert pearl == ar
    # the estimator must have formed an opinion from the run
    assert eng.orchestrator._p_ewma is not None


def test_gamma_auto_bench_protocol():
    """Fixed-step bench under gamma=-1 completes and reports tokens."""
    cfg = tiny_pearl_config(gamma=-1, gamma_profile_batches=(2,))
    eng = PearlEngine(cfg)
    for i in range(2):
        eng.add_request(
            [1 + i, 2, 3], SamplingParams(temperature=0.0, max_tokens=64)
        )
    _, num_tokens, num_acc, t = eng.bench_generate(num_pearl_steps=8)
    assert all(n > 1 for n in num_tokens)
