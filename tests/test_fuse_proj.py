"""Fused qkv / gate|up projections (ModelConfig.fuse_proj) — outputs
must match the separate-GEMM path (the fused weight is the same matrix,
column-concatenated; reference: linear.py:92-150 loads fused weights the
same way)."""

from __future__ import annotations

import numpy as np

from nano_pearl_tpu import PearlEngine
from nano_pearl_tpu.config import SamplingParams

from helpers import tiny_model_config, tiny_pearl_config


def _gen(engine, prompts, max_tokens=24):
    for prompt in prompts:
        engine.add_request(
            prompt, SamplingParams(temperature=0.0, max_tokens=max_tokens)
        )
    out, *_ = engine.generate_token_ids()
    return out


def _prompts(seed=0, n=3):
    rng = np.random.default_rng(seed)
    return [rng.integers(2, 250, rng.integers(4, 12)).tolist() for _ in range(n)]


def test_fuse_proj_matches_separate():
    prompts = _prompts()
    plain = PearlEngine(tiny_pearl_config())
    want = _gen(plain, prompts)

    fused_cfg = tiny_pearl_config(
        draft=tiny_model_config(fuse_proj=True),
        target=tiny_model_config(fuse_proj=True),
    )
    eng = PearlEngine(fused_cfg)
    assert "wqkv" in eng.orchestrator.target.params["layers"]
    assert "wgu" in eng.orchestrator.target.params["layers"]
    got = _gen(eng, prompts)
    assert got == want

    # PEARL == AR inside the fused engine (T=0 losslessness)
    for prompt in prompts:
        eng.add_request(prompt, SamplingParams(temperature=0.0, max_tokens=24))
    ar, *_ = eng.AR_generate_token_ids()
    assert ar == got


def test_fuse_proj_qkv_bias_qk_norm():
    mk = lambda fuse: tiny_model_config(
        architecture="Qwen3ForCausalLM", qkv_bias=True, qk_norm=True,
        fuse_proj=fuse,
    )
    prompts = _prompts(seed=1)
    want = _gen(PearlEngine(tiny_pearl_config(draft=mk(False), target=mk(False))), prompts)
    got = _gen(PearlEngine(tiny_pearl_config(draft=mk(True), target=mk(True))), prompts)
    assert got == want


def test_fuse_proj_quantized():
    mk = lambda fuse: tiny_model_config(quant="int8", fuse_proj=fuse)
    prompts = _prompts(seed=2)
    want = _gen(PearlEngine(tiny_pearl_config(draft=mk(False), target=mk(False))), prompts)
    eng = PearlEngine(tiny_pearl_config(draft=mk(True), target=mk(True)))
    layers = eng.orchestrator.target.params["layers"]
    assert set(layers["wqkv"]) == {"q", "s"}
    got = _gen(eng, prompts)
    assert got == want
