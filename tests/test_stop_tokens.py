"""Per-request stop tokens (SamplingParams.stop_token_ids — beyond the
reference, whose stop set is the model's global EOS only). Stops extend
the EOS set for one request: the PEARL verdict treats them exactly like
EOS (same pre/post-verify finish semantics), the AR path stops on them,
and requests with stops take the overlap execution path (the fused
program's stop set stays the global EOS, like top-k/top-p)."""

from __future__ import annotations

from nano_pearl_tpu.config import SamplingParams
from nano_pearl_tpu.engine.engine import PearlEngine

from helpers import tiny_pearl_config


PROMPT = [1, 2, 3, 4, 5]


def _run(engine_fn, params):
    eng = engine_fn()
    eng.add_request(PROMPT, params)
    pearl, _, _, _ = eng.generate_token_ids()
    eng.add_request(PROMPT, params)
    ar, _, _, _ = eng.AR_generate_token_ids()
    return pearl[0], ar[0]


def test_stop_token_truncates_and_stays_lossless():
    mk = lambda: PearlEngine(tiny_pearl_config())
    base, base_ar = _run(mk, SamplingParams(temperature=0.0, max_tokens=24,
                                            ignore_eos=True))
    assert base == base_ar
    # pick a token the greedy stream actually produces mid-stream
    stop = base[len(base) // 2]
    first = base.index(stop)
    pearl, ar = _run(mk, SamplingParams(temperature=0.0, max_tokens=24,
                                        stop_token_ids=(stop,)))
    assert pearl == ar, "PEARL != AR with stop tokens"
    assert pearl[-1] == stop and len(pearl) == first + 1, (
        "generation must end at the first stop hit (inclusive)"
    )


def test_stop_tokens_mixed_batch():
    """One request stops early, its batchmate runs to max_tokens; both
    match their solo runs."""
    mk = lambda: PearlEngine(tiny_pearl_config())
    base, _ = _run(mk, SamplingParams(temperature=0.0, max_tokens=20,
                                      ignore_eos=True))
    stop = base[5]
    eng = mk()
    eng.add_request(PROMPT, SamplingParams(temperature=0.0, max_tokens=20,
                                           stop_token_ids=(stop,)))
    eng.add_request(list(PROMPT), SamplingParams(temperature=0.0, max_tokens=20,
                                                 ignore_eos=True))
    out, _, _, _ = eng.generate_token_ids()
    assert out[0] == base[: base.index(stop) + 1]
    assert out[1] == base[:20]


def test_ignore_eos_disables_stops():
    mk = lambda: PearlEngine(tiny_pearl_config())
    base, _ = _run(mk, SamplingParams(temperature=0.0, max_tokens=16,
                                      ignore_eos=True))
    stop = base[3]
    pearl, ar = _run(mk, SamplingParams(temperature=0.0, max_tokens=16,
                                        ignore_eos=True, stop_token_ids=(stop,)))
    assert pearl == ar == base, "ignore_eos must disable stop tokens too"
