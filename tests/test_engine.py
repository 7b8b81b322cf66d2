"""End-to-end engine behavior: the PEARL==AR greedy losslessness
invariant (SURVEY.md §4 point 1), bench mode, prefix caching, TP."""

import numpy as np
import pytest

from nano_pearl_tpu import PearlEngine
from nano_pearl_tpu.config import SamplingParams

from helpers import tiny_model_config, tiny_pearl_config

PROMPTS = [
    [1, 2, 3, 4, 5],
    [9, 8, 7],
    [100, 101, 102, 103, 104, 105, 106],
    [42],
]


def _add_all(eng, max_tokens=16, temperature=0.0, ignore_eos=False):
    for p in PROMPTS:
        eng.add_request(
            p, SamplingParams(temperature=temperature, max_tokens=max_tokens, ignore_eos=ignore_eos)
        )


@pytest.fixture(scope="module")
def engine():
    return PearlEngine(tiny_pearl_config())


@pytest.mark.parametrize("gamma", [1, 2, 4])
def test_pearl_equals_ar_greedy(engine, gamma):
    """Lossless speculative decoding: at T=0 the PEARL token stream must
    equal target-only greedy decoding, whatever the draft proposes
    (reference validation strategy, bench.py / SURVEY.md §4)."""
    engine.config.gamma = gamma
    _add_all(engine)
    pearl, n_pearl, acc, _ = engine.generate_token_ids()
    _add_all(engine)
    ar, n_ar, _, _ = engine.AR_generate_token_ids()
    assert pearl == ar
    assert n_pearl == [16] * len(PROMPTS)
    assert all(len(a) >= 1 for a in acc)


def test_eos_stops_generation():
    """The committed stream stops on EOS when ignore_eos is False."""
    eng = PearlEngine(tiny_pearl_config())
    eng.add_request([1, 2, 3], SamplingParams(temperature=0.0, max_tokens=64))
    out, n, _, _ = eng.generate_token_ids()
    eos = eng.config.eos
    cut = [i for i, t in enumerate(out[0]) if t in eos]
    if cut:  # random model did emit eos: everything after must be absent
        assert cut[0] == len(out[0]) - 1
    eng.add_request([1, 2, 3], SamplingParams(temperature=0.0, max_tokens=64, ignore_eos=True))
    out2, n2, _, _ = eng.generate_token_ids()
    assert n2 == [64]


def test_bench_generate_fixed_steps(engine):
    engine.config.gamma = 3
    _add_all(engine, max_tokens=8)  # bench overrides max_tokens/eos
    out, n, acc, elapsed = engine.bench_generate(num_pearl_steps=12)
    assert len(out) == len(PROMPTS)
    # every sequence survived all 12 rounds (none finished early)
    assert all(v >= 12 for v in n)
    assert elapsed > 0


def test_mat_accounting(engine):
    """num_acc_tokens counts verified tokens: everything emitted except
    the unverified prefill token and (on an accept-finish) the trailing
    unverified window (reference semantics: cur_acc_tokens/num_acc_tokens,
    pearl_model_runner.py:626-656,688-694)."""
    gamma = 2
    engine.config.gamma = gamma
    _add_all(engine, max_tokens=12)
    out, n, acc, _ = engine.generate_token_ids()
    for tokens, accs in zip(out, acc):
        assert len(tokens) - gamma - 1 <= sum(accs) <= len(tokens)


def test_prefix_cache_within_batch(engine):
    """Identical prompts in one batch share prompt KV blocks
    (reference: hash-based prefix cache, block_manager.py:56-82)."""
    engine.config.gamma = 2
    long_prompt = list(range(1, 40))  # spans 2 full 16-blocks
    engine.add_request(long_prompt, SamplingParams(temperature=0.0, max_tokens=4))
    engine.add_request(long_prompt, SamplingParams(temperature=0.0, max_tokens=4))
    out, n, _, _ = engine.generate_token_ids()
    assert out[0] == out[1]


def test_prefix_cache_across_batches_fast_path():
    """A prompt whose prefix blocks were written by a PREVIOUS admission
    batch takes the pre-gathered prefix-prefill program
    (runner._prefill_prefix_impl) and must produce identical outputs.
    max_num_batched_tokens forces the two identical prompts into separate
    admission batches, so batch 2 hits batch 1's committed blocks."""
    from helpers import tiny_pearl_config

    cfg = tiny_pearl_config(
        max_model_len=256, max_num_batched_tokens=256, gamma=2
    )
    eng = PearlEngine(cfg)
    long_prompt = list(range(1, 131))  # 2 prompts > 256 tokens -> 2 batches
    for _ in range(2):
        eng.add_request(long_prompt, SamplingParams(temperature=0.0, max_tokens=4))
    out, n, _, _ = eng.generate_token_ids()
    assert out[0] == out[1]
    # the second batch must have gone through the prefix program
    assert eng.target._jit_prefill_prefix._cache_size() > 0
    assert eng.draft._jit_prefill_prefix._cache_size() > 0


def test_temperature_sampling_differs_and_completes(engine):
    engine.config.gamma = 2
    # ignore_eos: with random weights a T=1 sample can hit EOS by chance
    _add_all(engine, max_tokens=10, temperature=1.0, ignore_eos=True)
    out, n, _, _ = engine.generate_token_ids()
    assert n == [10] * len(PROMPTS)


def test_identical_models_accept_everything():
    """Draft == target (weights shared) at T=0 must accept every window
    (the BASELINE.json config-0 scenario)."""
    cfg = tiny_pearl_config(gamma=4)
    eng = PearlEngine(cfg)
    eng2 = PearlEngine(cfg, draft_params=eng.target.params, target_params=eng.target.params)
    eng2.add_request([1, 2, 3], SamplingParams(temperature=0.0, max_tokens=32, ignore_eos=True))
    out, n, acc, _ = eng2.bench_generate(num_pearl_steps=5)
    # after the first (pre-verify) round every round accepts gamma tokens
    assert bool(np.all(np.asarray(acc[0][:-1]) >= 1))
    mat = sum(acc[0]) / len(acc[0])
    assert mat > 2.0, f"MAT {mat} too low for identical models"


def test_tp_sharded_engine_matches_tp1(tmp_path):
    """TP-sharded generation (incl. non-power-of-2 target TP) must match
    TP=1 given the same checkpoint; also exercises the path-based flow
    (config.json parse + safetensors load + pad + shard)."""
    import pytest

    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")

    def mk(path, hidden, heads, kv):
        # NB: seed from the stable basename, not hash(str(path)) — str
        # hashing is salted per process and tmp_path varies per run, so
        # every run would get different weights (and the occasional
        # near-tie logit that TP's reduction order flips).
        import zlib

        torch.manual_seed(zlib.crc32(path.name.encode()))
        cfg = transformers.LlamaConfig(
            hidden_size=hidden, intermediate_size=hidden * 2, num_hidden_layers=2,
            num_attention_heads=heads, num_key_value_heads=kv, vocab_size=211,
            max_position_embeddings=256, torch_dtype="float32",
        )
        model = transformers.AutoModelForCausalLM.from_config(cfg).float()
        with torch.no_grad():
            # sharpen logit margins: TP changes fp reduction order by
            # ~1 ulp, which flips argmax on the near-ties random tiny
            # models produce; greedy parity needs real margins
            model.lm_head.weight.mul_(8.0)
        model.save_pretrained(str(path))
        return str(path)

    d_path = mk(tmp_path / "draft", 64, 4, 2)
    t_path = mk(tmp_path / "target", 96, 6, 3)

    outs = []
    for dtp, ttp in ((1, 1), (2, 3)):
        eng = PearlEngine(
            tiny_pearl_config(draft=d_path, target=t_path, draft_tp=dtp, target_tp=ttp)
        )
        eng.add_request([1, 2, 3, 4], SamplingParams(temperature=0.0, max_tokens=12))
        out, _, _, _ = eng.generate_token_ids()
        outs.append(out)
    assert outs[0] == outs[1]


def test_ar_bench_fixed_steps():
    """AR_bench_generate: fixed-step constant-batch AR baseline. The
    token stream must match AR_generate over the same horizon (greedy
    determinism) and reserve_steps must not change outputs — it only
    widens the block reservation so warmups compile the measured run's
    exact fused program."""
    eng = PearlEngine(tiny_pearl_config())
    _add_all(eng, max_tokens=13, ignore_eos=True)
    ar, n_ar, _, _ = eng.AR_generate_token_ids()
    _add_all(eng, max_tokens=13, ignore_eos=True)
    bench, n_b, _, _ = eng.AR_bench_generate(num_steps=12)  # prefill adds 1
    assert n_b == [13] * len(PROMPTS)
    assert bench == ar
    _add_all(eng, max_tokens=13, ignore_eos=True)
    bench2, _, _, _ = eng.AR_bench_generate(num_steps=12, reserve_steps=40)
    assert bench2 == bench


def test_pearl_bench_reserve_steps():
    """bench_generate(reserve_steps=...) must leave outputs unchanged."""
    eng = PearlEngine(tiny_pearl_config())
    _add_all(eng, max_tokens=8, ignore_eos=True)
    a, _, _, _ = eng.bench_generate(num_pearl_steps=3)
    _add_all(eng, max_tokens=8, ignore_eos=True)
    b, _, _, _ = eng.bench_generate(num_pearl_steps=3, reserve_steps=12)
    assert a == b


def test_warmup_leaves_engine_clean():
    """config.warmup pre-compiles serve-path programs via dummy requests
    and must leave no residue: no finished/running state, and subsequent
    generation matches a cold engine."""
    warm = PearlEngine(tiny_pearl_config(warmup=(1, 2)))
    assert warm.stats()["waiting"] == 0 and warm.stats()["running"] == 0
    assert warm.stats()["completed_requests"] == 0
    cold = PearlEngine(
        tiny_pearl_config(),
        draft_params=warm.draft.params,
        target_params=warm.target.params,
    )
    _add_all(warm)
    a, _, _, _ = warm.generate_token_ids()
    _add_all(cold)
    b, _, _, _ = cold.generate_token_ids()
    assert a == b
