"""Data-parallel serving (engine/dp.py): routing, merged results, and
T=0 equivalence with a single engine."""

import numpy as np
import pytest

from nano_pearl_tpu.config import SamplingParams
from nano_pearl_tpu.engine.dp import DataParallelEngine
from nano_pearl_tpu import PearlEngine

from helpers import tiny_pearl_config


def prompts(n, rng):
    return [rng.integers(2, 255, int(rng.integers(3, 9))).tolist() for _ in range(n)]


def test_dp_routing_balances_load():
    dpe = DataParallelEngine(tiny_pearl_config(), dp=2)
    rng = np.random.default_rng(0)
    for p in prompts(8, rng):
        dpe.add_request(p, SamplingParams(temperature=0.0, max_tokens=4))
    loads = [
        len(r.scheduler.waiting) + len(r.scheduler.running) for r in dpe.replicas
    ]
    assert loads == [4, 4]


def test_dp_generate_matches_single_engine_at_t0():
    """dp=2 must produce exactly the completions a single engine produces
    for the same requests (greedy PEARL is lossless; replicas share
    weights via the same seed0 params)."""
    rng = np.random.default_rng(1)
    ps = prompts(6, rng)
    sp = lambda: SamplingParams(temperature=0.0, max_tokens=12)

    single = PearlEngine(tiny_pearl_config())
    for p in ps:
        single.add_request(p, sp())
    want, want_n, _, _ = single.generate_token_ids()

    # build the dp engine from the SAME weights as the single engine
    dpe = DataParallelEngine(
        tiny_pearl_config(),
        dp=2,
        draft_params=single.draft.params,
        target_params=single.target.params,
    )
    for p in ps:
        dpe.add_request(p, sp())
    got, got_n, acc, elapsed = dpe.generate_token_ids()

    # merged output is seq_id-ordered; requests were submitted in the
    # same order, so the completions must match pairwise regardless of
    # which replica served them
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert sorted(got_n) == sorted(want_n)
    assert elapsed > 0


def test_dp_serve_step_continuous():
    dpe = DataParallelEngine(tiny_pearl_config(), dp=2)
    rng = np.random.default_rng(2)
    for p in prompts(4, rng):
        dpe.submit(p, SamplingParams(temperature=0.0, max_tokens=6))
    done = []
    added_midflight = False
    for _ in range(50):
        done.extend(dpe.serve_step(fused_rounds=4))
        # mid-flight admission on one replica
        if done and not added_midflight:
            dpe.submit([9, 8, 7], SamplingParams(temperature=0.0, max_tokens=6))
            added_midflight = True
        if not dpe.has_work and added_midflight:
            break
    assert not dpe.has_work
    assert len(done) == 5
    assert all(len(t) == 6 for _, t, _ in done)
