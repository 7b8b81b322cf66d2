"""Pipeline parallelism: exact parity with the plain forward.

parallel/pp.py shards the decoder stack over a ``pp`` mesh axis (a
capability beyond the reference — SURVEY.md §2.8 marks pipeline
parallelism absent there). These tests pin:

- ``pp_forward`` == ``forward`` bitwise-close on the same weights/cache
  (including the KV cache content after the step — off-wavefront stages
  must not corrupt their layer chunks), and
- the end-to-end engine emits the identical greedy token stream with and
  without pp, including pp composed with tp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nano_pearl_tpu.config import ModelConfig
from nano_pearl_tpu.models.transformer import forward, init_params, make_rope_table
from nano_pearl_tpu.ops.attention import paged_attention_jnp, prefill_attention_jnp
from nano_pearl_tpu.ops.kv_cache import make_kv_cache
from nano_pearl_tpu.parallel.pp import pp_forward

from helpers import tiny_model_config, tiny_pearl_config

NB, BS = 7, 4


def _mesh(pp, tp):
    devs = np.array(jax.devices()[: pp * tp]).reshape(pp, tp)
    return Mesh(devs, ("pp", "tp"))


def _setup(mesh, cfg):
    params = init_params(cfg, jax.random.key(0))
    rope = make_rope_table(cfg)
    kv = make_kv_cache(
        cfg.num_hidden_layers, NB, BS, cfg.num_key_value_heads, cfg.head_dim,
        dtype=jnp.float32,
    )
    kv = jax.random.normal(jax.random.key(1), kv.shape, kv.dtype)
    from nano_pearl_tpu.parallel.sharding import param_specs, kv_cache_spec

    shard = lambda x, s: jax.device_put(x, NamedSharding(mesh, s))
    params_pp = jax.tree.map(
        shard, params, param_specs(cfg, pp=True),
        is_leaf=lambda x: isinstance(x, P),
    )
    kv_pp = shard(kv, kv_cache_spec(pp=True))
    return params, params_pp, rope, kv, kv_pp


@pytest.mark.parametrize("qk_norm", [False, True])
def test_pp_forward_matches_plain_decode(qk_norm):
    cfg = tiny_model_config(num_hidden_layers=4, qk_norm=qk_norm)
    mesh = _mesh(2, 2)
    params, params_pp, rope, kv, kv_pp = _setup(mesh, cfg)
    n, m = 5, 4
    tokens = jnp.array([3, 7, 11, 200, 50], jnp.int32)
    positions = jnp.array([0, 4, 9, 2, 15], jnp.int32)
    bt = jax.random.randint(jax.random.key(2), (n, m), 0, NB, jnp.int32)
    ctx = positions + 1
    bs = BS
    slots = jnp.take_along_axis(bt, (positions // bs)[:, None], 1)[:, 0] * bs + positions % bs
    from functools import partial

    attn = partial(paged_attention_jnp, scale=cfg.head_dim**-0.5)
    h_ref, kv_ref = forward(cfg, params, kv, tokens, positions, slots, rope, attn, (bt, ctx))
    h_pp, kv_out = pp_forward(
        mesh, cfg, params_pp, kv_pp, tokens, positions, slots, rope, attn, (bt, ctx)
    )
    np.testing.assert_allclose(np.asarray(h_ref), np.asarray(h_pp), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(kv_ref), np.asarray(kv_out), rtol=2e-5, atol=2e-5
    )


def test_pp_forward_matches_plain_prefill():
    cfg = tiny_model_config(num_hidden_layers=4)
    mesh = _mesh(4, 2)
    params, params_pp, rope, kv, kv_pp = _setup(mesh, cfg)
    b, lq, m = 2, 4, 4
    tokens = jnp.arange(b * lq, dtype=jnp.int32) + 5
    q_pos = jnp.array([[0, 1, 2, 3], [0, 1, -1, -1]], jnp.int32)
    positions = jnp.clip(q_pos, 0).reshape(-1)
    bt = jax.random.randint(jax.random.key(3), (b, m), 0, NB, jnp.int32)
    slots = (
        jnp.take_along_axis(bt, positions.reshape(b, lq) // BS, 1).reshape(-1) * BS
        + positions % BS
    )
    from functools import partial

    attn = partial(prefill_attention_jnp, scale=cfg.head_dim**-0.5)
    h_ref, kv_ref = forward(
        cfg, params, kv, tokens, positions, slots, rope, attn, (bt, q_pos)
    )
    h_pp, kv_out = pp_forward(
        mesh, cfg, params_pp, kv_pp, tokens, positions, slots, rope, attn, (bt, q_pos)
    )
    valid = np.asarray(q_pos).reshape(-1) >= 0
    np.testing.assert_allclose(
        np.asarray(h_ref)[valid], np.asarray(h_pp)[valid], rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(kv_ref), np.asarray(kv_out), rtol=2e-5, atol=2e-5
    )


def test_pp_engine_matches_plain_engine():
    """End-to-end: greedy PEARL streams identical with and without pp
    (same seeds -> same weights); pp composed with tp on the target."""
    from nano_pearl_tpu import PearlEngine
    from nano_pearl_tpu.config import SamplingParams

    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [42]]

    def run(**over):
        eng = PearlEngine(tiny_pearl_config(**over))
        for p in prompts:
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=12))
        out, n, _, _ = eng.generate_token_ids()
        del eng
        return out, n

    base_out, base_n = run()
    pp_out, pp_n = run(draft_pp=2, target_pp=2)
    assert pp_out == base_out
    assert pp_n == base_n

    # pp composed with tp: compare against the SAME tp (tp changes the
    # all-reduce order, which can flip greedy near-ties on random tiny
    # weights — that is a tp property, not a pp one)
    tp_out, tp_n = run(target_tp=2)
    pptp_out, pptp_n = run(draft_pp=2, target_pp=2, target_tp=2)
    assert pptp_out == tp_out
    assert pptp_n == tp_n
