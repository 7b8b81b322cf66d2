"""Model registry keyed by HF ``architectures[0]``
(reference: nano_pearl/models/__init__.py:5-9).

All three reference families share the generic functional transformer;
the architecture-specific deltas (qkv bias, per-head q/k norm, explicit
head_dim) are plain config flags resolved in ``ModelConfig``:

- LlamaForCausalLM (reference: models/llama.py): no qkv bias, no qk norm
- Qwen2ForCausalLM (reference: models/qwen2.py:49): qkv_bias=True
- Qwen3ForCausalLM (reference: models/qwen3.py:70-81): qk_norm, head_dim

Beyond the reference (it supports dense models only — SURVEY §2.8), the
sparse-MoE families ride the same transformer with an MoE MLP block
(ops/moe.py) and expert-parallel sharding (parallel/sharding.py):

- Qwen3MoeForCausalLM: qk_norm + num_experts/top-k/norm_topk_prob
- MixtralForCausalLM: num_local_experts, always-renormalized top-k
"""

from nano_pearl_tpu.models import transformer

SUPPORTED_ARCHITECTURES = (
    "LlamaForCausalLM",
    "Qwen2ForCausalLM",
    "Qwen3ForCausalLM",
    "Qwen3MoeForCausalLM",
    "MixtralForCausalLM",
)


def get_model(architecture: str):
    if architecture not in SUPPORTED_ARCHITECTURES:
        raise ValueError(
            f"unsupported architecture {architecture!r}; supported: {SUPPORTED_ARCHITECTURES}"
        )
    return transformer
