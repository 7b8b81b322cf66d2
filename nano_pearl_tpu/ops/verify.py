"""PEARL verification verdict, fully vectorized on device.

TPU re-design of the reference's target-master verify loop
(reference: pearl_model_runner.py:598-658): the Python per-sequence loop
with rejection sampling, revise-token resampling and EOS/max-token
bookkeeping becomes one batched jnp program over ``[B, gamma]`` arrays
that runs on the target sub-mesh right after the packed forward. Only
the 5 small per-sequence verdict vectors travel back to the host.

Semantics preserved exactly (checked by tests against a literal Python
transcription of the reference loop):

- accept test:  r <= p_target(token) with norm_probs (one-hot at T=0)
  (reference: :611-616)
- revise token: sample from logits with the rejected token masked -inf
  (reference: :618-619)
- pre-verify sequences contribute a single token, post-verify gamma
  tokens with first-rejection cutoff n (reference: :624-658)
- finish rules incl. per-accepted-token EOS scan and max_tokens margin
  (reference: :632,:636,:641,:650)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from nano_pearl_tpu.ops.sampling import NEG_INF, norm_probs, sample


@jax.tree_util.register_dataclass
@dataclass
class VerifyResult:
    """Per-sequence verdict (the reference's 4xB ``verify_res`` plus the
    accepted-token count used for MAT bookkeeping on the host)."""

    acc: jax.Array  # [B] bool: whole window accepted
    rollout: jax.Array  # [B] int32: tokens the draft must roll back beyond gamma
    revise: jax.Array  # [B] int32: corrected token (-1 when fully accepted)
    finish: jax.Array  # [B] bool
    n_acc: jax.Array  # [B] int32: accepted tokens this round (n in the reference)


def verify_verdict(
    logits: jax.Array,  # [B, G, V] target logits for the packed window
    tbv: jax.Array,  # [B, G] int32 to-be-verified draft tokens
    is_pre: jax.Array,  # [B] bool: sequence is in pre-verify mode
    temperatures: jax.Array,  # [B] f32
    num_completion: jax.Array,  # [B] i32 target-side completion count pre-update
    max_tokens: jax.Array,  # [B] i32
    ignore_eos: jax.Array,  # [B] bool
    eos_ids: jax.Array,  # [E] i32 global stop set, or [B, S] per-request
    #   stop matrix (EOS plus each request's stop_token_ids, -1 padded)
    key: jax.Array,
    gamma: int,
    greedy: bool = False,
) -> VerifyResult:
    b, g, v = logits.shape
    assert g == gamma
    # materialize the logits before any argmax/reduction so the ranking
    # matches the draft side's greedy() bit-for-bit (see
    # ops/sampling.greedy — fused matmul+argmax reducers diverge)
    logits = jax.lax.optimization_barrier(logits)
    kr, ks = jax.random.split(key)

    temps = temperatures[:, None]  # broadcast over the window
    if greedy:
        # All-greedy batch: the accept test degenerates to token==argmax
        # and the revise sample to the (unmasked) argmax — no RNG, no
        # [B, G, V] gumbel draw in the compiled program. Exact for T=0:
        # norm_probs is one-hot, r<p one-hot acceptance == argmax match,
        # and the rejected token is never the argmax so masking is a
        # no-op for the revise pick.
        argmax_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        judge = tbv.astype(jnp.int32) == argmax_tok
        revised = argmax_tok
    else:
        probs = norm_probs(logits, jnp.broadcast_to(temps, (b, g)))
        p_tok = jnp.take_along_axis(probs, tbv[..., None].astype(jnp.int32), axis=-1)[..., 0]
        r = jax.random.uniform(kr, (b, g), dtype=jnp.float32)
        judge = r <= p_tok  # [B, G]

        # Revise candidates: rejected token masked out, then greedy/temp
        # sample for every row; only the row at the cutoff is used.
        onehot = jax.nn.one_hot(tbv, v, dtype=jnp.bool_)
        masked_logits = jnp.where(onehot, NEG_INF, logits.astype(jnp.float32))
        revised = sample(masked_logits, jnp.broadcast_to(temps, (b, g)), ks)  # [B, G]

    stops = (
        eos_ids if eos_ids.ndim == 2 else jnp.broadcast_to(eos_ids[None, :], (b, eos_ids.shape[0]))
    )  # [B, S]
    is_eos_tok = (tbv[..., None] == stops[:, None, :]).any(-1)  # [B, G]

    # --- post-verify: n = index of first rejection (gamma if none) ---
    rej = ~judge
    any_rej = rej.any(axis=1)
    first_rej = jnp.argmax(rej, axis=1)  # 0 if none, guarded by any_rej
    n_post = jnp.where(any_rej, first_rej, gamma)  # [B]

    pos = jax.lax.broadcasted_iota(jnp.int32, (b, g), 1)
    # EOS among accepted tokens (k < n): reference :640-642
    eos_hit_post = ((pos < n_post[:, None]) & is_eos_tok).any(axis=1)

    revise_post = jnp.take_along_axis(
        revised, jnp.minimum(n_post, gamma - 1)[:, None], axis=1
    )[:, 0]
    revise_post = jnp.where(any_rej, revise_post, -1)
    acc_post = ~any_rej
    rollout_post = gamma - n_post
    finish_post = (eos_hit_post & ~ignore_eos) | (
        num_completion >= max_tokens - jnp.minimum(n_post + 1, gamma)
    )

    # --- pre-verify: single token at window position 0 (reference :626-636) ---
    j0 = judge[:, 0]
    acc_pre = j0
    rollout_pre = jnp.where(j0, 0, gamma)
    revise_pre = revised[:, 0]
    finish_tok = jnp.where(j0, tbv[:, 0], revise_pre)
    finish_eos = (finish_tok[:, None] == stops).any(-1)
    finish_pre = (finish_eos & ~ignore_eos) | (num_completion >= max_tokens - 1)
    n_pre = jnp.where(j0, 1, 0).astype(jnp.int32)

    acc = jnp.where(is_pre, acc_pre, acc_post)
    rollout = jnp.where(is_pre, rollout_pre, rollout_post).astype(jnp.int32)
    revise = jnp.where(is_pre, revise_pre, revise_post).astype(jnp.int32)
    finish = jnp.where(is_pre, finish_pre, finish_post)
    n_acc = jnp.where(is_pre, n_pre, n_post).astype(jnp.int32)
    return VerifyResult(acc=acc, rollout=rollout, revise=revise, finish=finish, n_acc=n_acc)
