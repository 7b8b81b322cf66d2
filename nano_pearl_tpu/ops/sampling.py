"""Sampling, on-device (reference: nano_pearl/layers/sampler.py).

Improvements over the reference by construction:

- mixed greedy/temperature batches are supported (the reference asserts
  all-greedy or all-sampled, sampler.py:25-30) — the Gumbel trick with a
  per-row temperature gate degrades exactly to argmax at T=0.
- padded-vocab logits are masked here instead of gathered+truncated on a
  master rank (reference: embed_head.py:70-74) so sampling runs sharded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def mask_invalid_logits(logits: jax.Array, valid_vocab: int) -> jax.Array:
    """-inf the padded vocab tail so padded ids can never be sampled
    (reference: embed_head.py:74 truncates to valid_vocab_size instead)."""
    v = logits.shape[-1]
    if valid_vocab >= v:
        return logits
    iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, logits.ndim - 1)
    return jnp.where(iota < valid_vocab, logits, NEG_INF)


def apply_top_k_top_p(
    logits: jax.Array,  # [..., V]
    top_k: jax.Array,  # [...] int32; <= 0 disables
    top_p: jax.Array,  # [...] float32; >= 1 disables
    temperatures: jax.Array | None = None,  # [...] for the nucleus cumsum
) -> jax.Array:
    """HF-style top-k then top-p (nucleus) logit filtering, vectorized
    over mixed per-row settings (beyond the reference, whose sampler is
    temperature-only: layers/sampler.py). Kept tokens keep their logits;
    filtered tokens go to NEG_INF, so every consumer (Gumbel sampling,
    ``norm_probs`` for the PEARL accept test, revise resampling) sees the
    renormalized filtered distribution. The nucleus mass is computed at
    the row's sampling temperature, matching HF's warper order
    (temperature -> top_k -> top_p)."""
    lf = logits.astype(jnp.float32)
    v = lf.shape[-1]
    sorted_desc = -jnp.sort(-lf, axis=-1)
    iota = jax.lax.broadcasted_iota(jnp.int32, lf.shape, lf.ndim - 1)
    k_eff = jnp.where(top_k > 0, jnp.clip(top_k, 1, v), v)[..., None]
    in_k = iota < k_eff
    sorted_kept = jnp.where(in_k, sorted_desc, NEG_INF)
    t = 1.0 if temperatures is None else jnp.maximum(temperatures, 1e-10)[..., None]
    probs = jax.nn.softmax(sorted_kept / t, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep the minimal prefix whose mass reaches top_p (the crossing token
    # included — HF's shifted-mask semantics); position 0 always survives
    keep = (cum - probs) < jnp.minimum(top_p, 1.0)[..., None]
    count = jnp.sum(keep & in_k, axis=-1)
    thresh = jnp.take_along_axis(
        sorted_desc, jnp.maximum(count - 1, 0)[..., None], axis=-1
    )
    return jnp.where(lf < thresh, NEG_INF, lf)


def greedy(logits: jax.Array) -> jax.Array:
    """Argmax over the last dim (reference: sampler.py:39-40).

    The optimization barrier is load-bearing for PEARL's bitwise
    acceptance ceiling: without it XLA fuses the lm-head matmul into a
    streaming matmul+argmax reducer whose contraction schedule differs
    from the materialized-logits path — the draft's gamma-scan then
    commits tokens that disagree with the argmax of the very same
    (bitwise-identical) logits the target verifies against, ~3% of the
    time on near-tied random-weight logits (measured on v5e,
    tools/probe_ceiling_divergence2.py: internal-greedy vs
    emitted-argmax agreement 0.97 with zero top-ties). Forcing the
    logits to materialize makes every argmax consumer rank the same
    artifact; verify_verdict does the same on the target side."""
    logits = jax.lax.optimization_barrier(logits)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample(logits: jax.Array, temperatures: jax.Array, key: jax.Array) -> jax.Array:
    """Gumbel-max sampling with per-row temperature; T=0 rows are greedy.

    Equivalent in distribution to the reference's exponential-race
    (sampler.py:32-37): argmax(probs / Exp(1)) == argmax(logits/T + Gumbel).
    """
    t = temperatures.reshape(temperatures.shape + (1,) * (logits.ndim - temperatures.ndim))
    u = jax.random.uniform(key, logits.shape, dtype=jnp.float32, minval=1e-10, maxval=1.0)
    gumbel = -jnp.log(-jnp.log(u))
    z = logits.astype(jnp.float32) / jnp.maximum(t, 1e-10) + jnp.where(t > 0, gumbel, 0.0)
    # keep masked (-inf) logits unsamplable even after the gumbel bump
    z = jnp.where(logits <= NEG_INF / 2, NEG_INF, z)
    return jnp.argmax(z, axis=-1).astype(jnp.int32)


def norm_probs(logits: jax.Array, temperatures: jax.Array) -> jax.Array:
    """Token probabilities used by the PEARL accept test
    (reference: sampler.py:7-17 ``norm_logits``): one-hot(argmax) at T=0,
    softmax(logits/T) otherwise — vectorized over mixed-T rows."""
    t = temperatures.reshape(temperatures.shape + (1,) * (logits.ndim - temperatures.ndim))
    lf = logits.astype(jnp.float32)
    soft = jax.nn.softmax(lf / jnp.maximum(t, 1e-10), axis=-1)
    hard = jax.nn.one_hot(jnp.argmax(lf, axis=-1), logits.shape[-1], dtype=jnp.float32)
    return jnp.where(t > 0, soft, hard)
