"""Vectorized verdict vs a literal transcription of the reference's
per-sequence verify loop (reference: pearl_model_runner.py:611-658)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nano_pearl_tpu.ops.sampling import NEG_INF, norm_probs, sample
from nano_pearl_tpu.ops.verify import verify_verdict


def oracle(judge, tbv, is_pre, revised, num_completion, max_tokens, ignore_eos, eos_ids, gamma):
    """Python transcription of the reference target-master loop."""
    b = judge.shape[0]
    acc, rollout, revise, finish, n_acc = [], [], [], [], []
    is_eos = lambda t: t in eos_ids
    for i in range(b):
        if is_pre[i]:
            j0 = judge[i, 0]
            acc.append(bool(j0))
            rollout.append(0 if j0 else gamma)
            revise.append(int(revised[i, 0]))
            if j0:
                fin = (not ignore_eos[i] and is_eos(int(tbv[i, 0]))) or (
                    num_completion[i] >= max_tokens[i] - 1
                )
                n_acc.append(1)
            else:
                fin = (not ignore_eos[i] and is_eos(int(revised[i, 0]))) or (
                    num_completion[i] >= max_tokens[i] - 1
                )
                n_acc.append(0)
            finish.append(bool(fin))
        else:
            n = gamma
            fflag = False
            for j in range(gamma):
                if not ignore_eos[i] and judge[i, j] and is_eos(int(tbv[i, j])):
                    fflag = True
                if not judge[i, j]:
                    n = j
                    break
            acc.append(n == gamma)
            rollout.append(gamma - n)
            revise.append(int(revised[i, n]) if n < gamma else -1)
            finish.append(bool(fflag or num_completion[i] >= max_tokens[i] - min(n + 1, gamma)))
            n_acc.append(n)
    return map(np.asarray, (acc, rollout, revise, finish, n_acc))


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("gamma", [1, 3, 5])
def test_verdict_matches_reference_loop(seed, gamma):
    rng = np.random.default_rng(seed)
    b, v = 9, 37
    eos_ids = [3, 7]
    logits = rng.standard_normal((b, gamma, v)).astype(np.float32) * 3
    tbv = rng.integers(0, v, (b, gamma)).astype(np.int32)
    is_pre = rng.random(b) < 0.5
    temps = np.where(rng.random(b) < 0.5, 0.0, 0.9).astype(np.float32)
    # keep the T=0 / T>0 split per batch like the reference requires on
    # its side; our kernel supports mixed so test mixed too
    num_completion = rng.integers(0, 30, b).astype(np.int64)
    max_tokens = rng.integers(1, 40, b).astype(np.int64)
    ignore_eos = rng.random(b) < 0.3
    key = jax.random.key(seed * 7 + 1)

    res = verify_verdict(
        jnp.asarray(logits), jnp.asarray(tbv), jnp.asarray(is_pre),
        jnp.asarray(temps), jnp.asarray(num_completion), jnp.asarray(max_tokens),
        jnp.asarray(ignore_eos), jnp.asarray(eos_ids, jnp.int32), key, gamma,
    )

    # reproduce the kernel's randomness to feed the oracle
    kr, ks = jax.random.split(key)
    temps_bg = jnp.broadcast_to(jnp.asarray(temps)[:, None], (b, gamma))
    probs = np.asarray(norm_probs(jnp.asarray(logits), temps_bg))
    r = np.asarray(jax.random.uniform(kr, (b, gamma), dtype=jnp.float32))
    p_tok = np.take_along_axis(probs, tbv[..., None], axis=-1)[..., 0]
    judge = r <= p_tok
    onehot = np.eye(v, dtype=bool)[tbv]
    masked = np.where(onehot, NEG_INF, logits)
    revised = np.asarray(sample(jnp.asarray(masked), temps_bg, ks))

    acc, rollout, revise, finish, n_acc = oracle(
        judge, tbv, is_pre, revised, num_completion, max_tokens, ignore_eos, eos_ids, gamma
    )
    np.testing.assert_array_equal(np.asarray(res.acc), acc)
    np.testing.assert_array_equal(np.asarray(res.rollout), rollout)
    np.testing.assert_array_equal(np.asarray(res.revise), revise)
    np.testing.assert_array_equal(np.asarray(res.finish), finish)
    np.testing.assert_array_equal(np.asarray(res.n_acc), n_acc)


def test_greedy_verdict_accepts_matching_argmax():
    """At T=0, acceptance iff draft token == target argmax, and revise is
    the target argmax on rejection — the lossless property's engine."""
    gamma, v = 3, 11
    logits = np.zeros((1, gamma, v), np.float32)
    logits[0, :, 5] = 10.0  # target argmax = 5 everywhere
    tbv = np.asarray([[5, 5, 2]], np.int32)  # third token wrong
    res = verify_verdict(
        jnp.asarray(logits), jnp.asarray(tbv), jnp.asarray([False]),
        jnp.asarray([0.0]), jnp.asarray([0]), jnp.asarray([1000]),
        jnp.asarray([True]), jnp.asarray([0], jnp.int32), jax.random.key(0), gamma,
    )
    assert not bool(res.acc[0])
    assert int(res.n_acc[0]) == 2
    assert int(res.rollout[0]) == 1
    assert int(res.revise[0]) == 5


def test_verify_group_cap_lossless():
    """Sequence-chunked classic verify (verify_group_cap, the bs=32
    ceiling-leak mitigation: each chunk reruns the decode stream's GEMM
    schedule class) produces the same committed tokens as the unchunked
    program — chunks are disjoint sequence groups threaded through the
    cache, so T=0 outputs must match AR exactly either way."""
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).parent))
    from helpers import tiny_pearl_config

    from nano_pearl_tpu import PearlEngine
    from nano_pearl_tpu.config import SamplingParams

    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [4, 4, 4, 4], [11, 3]]

    def run(cap):
        eng = PearlEngine(tiny_pearl_config(verify_group_cap=cap))
        for prm in prompts:
            eng.add_request(prm, SamplingParams(temperature=0.0, max_tokens=24))
        out, _, _, _ = eng.generate_token_ids()
        for prm in prompts:
            eng.add_request(prm, SamplingParams(temperature=0.0, max_tokens=24))
        ar, _, _, _ = eng.AR_generate_token_ids()
        return out, ar

    out_c, ar_c = run(cap=2)  # 4 seqs -> 2 chunks
    out_0, ar_0 = run(cap=0)
    assert out_c == ar_c  # T=0 losslessness with chunked verify
    assert out_c == out_0 == ar_0
