"""Fused on-device PEARL execution: many rounds per dispatch.

The overlap orchestrator (engine/pearl.py) pays host round-trips per
round — on hardware where both model groups share devices (single chip,
or a deliberate union placement) there is no cross-group overlap to win,
so the whole generation loop belongs ON the device: this module compiles
draft gamma-scan + target packed verify + verdict + state update into
ONE program iterated by ``lax.while_loop``, the TPU-native completion of
what the reference approximates with CUDA graphs per decode step
(reference: pearl_model_runner.py:264-301) — here the *entire PEARL
loop* is a single XLA program with zero host synchronization per round.

The device state machine relies on an invariant of the PEARL update
rules (reference: :528-553, :667-694): once both streams start from the
same prefill token, the draft and target committed token streams are
IDENTICAL after every verify-apply —

- accept: draft already holds [P|G], target appends G -> both [C P G]
- reject at n: draft drops gamma + (rollout-1), target drops rollout-1,
  both append the same revise token -> both [C P[:n+1] r]

so one token buffer + one length vector represents both views; only the
KV caches and the transient in-flight window differ.

MAT bookkeeping matches the reference counters (:626-656): cur_acc
accumulates accepted tokens, each rejection emits (cur+n+1), finish
emits the running cur; the fused state keeps (cur, emitted_total,
emit_count) per sequence.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nano_pearl_tpu.config import PearlConfig
from nano_pearl_tpu.engine.runner import GroupRunner
from nano_pearl_tpu.models.transformer import compute_logits
from nano_pearl_tpu.ops.sampling import apply_top_k_top_p, greedy, sample
from nano_pearl_tpu.ops.verify import verify_verdict


def _row_slots(block_tables, positions, block_size):
    """Flat KV slot for (row, position) via that row's block table."""
    blk = jnp.take_along_axis(block_tables, positions // block_size, axis=1)
    return blk * block_size + positions % block_size


class FusedPearl:
    """Compiled multi-round PEARL/AR loops over both models' state."""

    def __init__(self, pcfg: PearlConfig, draft: GroupRunner, target: GroupRunner):
        self.pcfg = pcfg
        self.draft = draft
        self.target = target
        self.block_size = pcfg.kvcache_block_size
        # params and rope tables MUST be jit arguments, not closure
        # captures — captured jax Arrays are inlined into the HLO as
        # constants (gigabytes of weights -> pathological compiles)
        self._jit_pearl = jax.jit(
            self._pearl_rounds_impl,
            static_argnames=("gamma", "greedy_only", "filtered"),
            donate_argnums=(4, 5, 6),  # dkv, tkv, tokens
        )
        self._jit_ar = jax.jit(
            self._ar_rounds_impl,
            static_argnames=("greedy_only", "filtered"),
            donate_argnums=(2, 3),
        )

    @staticmethod
    def compatible(draft: GroupRunner, target: GroupRunner) -> bool:
        """Fused execution needs one program spanning both models: the
        two groups must live on the same device set."""
        d = set(draft.gmesh.mesh.devices.flat)
        t = set(target.gmesh.mesh.devices.flat)
        return d == t

    # ------------------------------------------------------------ PEARL

    def _draft_gamma(self, dparams, drope, dkv, tokens_last, positions, bt, ctx, gamma, b1=None):
        dcfg, dr = self.draft.cfg, self.draft
        bs = self.block_size
        split = dr._attn_decode_split is not None and b1 is not None
        # per-step split boundary: step 0 is verified by THIS round
        # (b1 = L - num_input); steps >= 1 by the NEXT round's
        # full-accept verify (b1 = L) — see runner._gamma_impl
        b1_next = ctx  # round-start length L per row

        def step(carry, t):
            kv, toks, pos, cl = carry
            slots = _row_slots(bt, pos[:, None], bs)[:, 0]
            if split:
                b1_t = jnp.where(t == 0, b1, b1_next)
                attn, aargs = dr._attn_decode_split, (bt, cl, b1_t)
            else:
                attn, aargs = dr._attn_decode, (bt, cl)
            hidden, kv = dr._forward(
                dcfg, dparams, kv, toks, pos, slots, drope,
                attn, aargs, kv_write_fn=dr._kv_write,
            )
            nxt = greedy(compute_logits(dcfg, dparams, hidden))
            return (kv, nxt, pos + 1, cl + 1), nxt

        (dkv, _, _, _), toks = jax.lax.scan(
            step, (dkv, tokens_last, positions, ctx),
            jnp.arange(gamma, dtype=jnp.int32),
        )
        return dkv, toks.T  # [B, gamma]

    def _target_packed(self, tparams, trope, tkv, tokens, length, num_input, bt, gamma):
        tcfg, tr = self.target.cfg, self.target
        bs = self.block_size
        b = length.shape[0]
        j = jnp.arange(gamma, dtype=jnp.int32)[None, :]
        idx = length[:, None] - num_input[:, None] + j  # [B, G]
        valid = j < num_input[:, None]
        idx_c = jnp.clip(idx, 0)
        toks = jnp.take_along_axis(tokens, idx_c, axis=1)
        positions = jnp.where(valid, idx_c, 0)
        ctx = jnp.where(valid, idx_c + 1, 1)
        slots = jnp.where(
            valid,
            _row_slots(bt, idx_c, bs),
            tr.garbage_block * bs + (j % bs),
        )
        flat = lambda x: x.reshape(b * gamma)
        hidden, tkv = tr.packed_verify_forward(
            tparams, trope, tkv, flat(toks), flat(positions), flat(slots),
            bt, flat(ctx), gamma,
        )
        logits = compute_logits(tcfg, tparams, hidden).reshape(b, gamma, -1)
        return tkv, logits

    def _pearl_rounds_impl(
        self, dparams, tparams, dropes, dkv, tkv, tokens, length, pre, finished,
        cur_acc, emitted, emit_cnt,
        bt_d, bt_t, temps, max_tokens, ignore_eos, prompt_len, eos_ids,
        tk, tp, num_rounds, seed0, *, gamma, greedy_only=False, filtered=False,
    ):
        drope, trope = dropes
        """num_rounds PEARL rounds (early exit when all rows finish)."""
        b = length.shape[0]
        g_j = jnp.arange(gamma, dtype=jnp.int32)[None, :]

        def cond(carry):
            i = carry[0]
            finished = carry[6]
            return (i < num_rounds) & ~jnp.all(finished)

        def body(carry):
            (i, dkv, tkv, tokens, length, pre, finished, cur_acc, emitted, emit_cnt) = carry

            last = jnp.take_along_axis(tokens, jnp.clip(length - 1, 0)[:, None], axis=1)[:, 0]
            num_input = jnp.where(pre, 1, gamma).astype(jnp.int32)
            dkv, G = self._draft_gamma(
                dparams, drope, dkv, last, length - 1, bt_d, length, gamma,
                b1=length - num_input,
            )
            tkv, logits = self._target_packed(tparams, trope, tkv, tokens, length, num_input, bt_t, gamma)

            # to-be-verified window: previous round shifted by one, ending
            # with the first token of the current draft round
            # (reference: :518-521)
            idx = jnp.clip(length[:, None] - num_input[:, None] + 1 + g_j, 0)
            tbv = jnp.take_along_axis(tokens, idx, axis=1)
            tbv = jnp.where(g_j == (num_input[:, None] - 1), G[:, :1], tbv)

            if filtered:
                # per-request top-k/top-p filter the accept-test and
                # revise distributions exactly as the overlap path does
                # (runner._verdict_impl; round-1 gap: any filtered request
                # forced the whole engine off the fused loop)
                logits = apply_top_k_top_p(
                    logits, tk[:, None], tp[:, None], temps[:, None]
                )
            res = verify_verdict(
                logits, tbv, pre, temps, length - prompt_len, max_tokens,
                ignore_eos, eos_ids, jax.random.key(seed0 + i), gamma,
                greedy=greedy_only,
            )
            acc, n, rollout, revise = res.acc, res.n_acc, res.rollout, res.revise
            fin = res.finish
            active = ~finished

            new_len = jnp.where(
                acc, length + gamma,
                jnp.where(pre, length + 1, length - gamma + n + 2),
            )
            tok_acc = jax.vmap(
                lambda row, g, l: jax.lax.dynamic_update_slice(row, g, (l,))
            )(tokens, G, length)
            tok_rej = jax.vmap(
                lambda row, r, l: jax.lax.dynamic_update_slice(row, r[None], (l,))
            )(tokens, revise, new_len - 1)
            new_tokens = jnp.where(acc[:, None], tok_acc, tok_rej)
            tokens = jnp.where(active[:, None], new_tokens, tokens)

            emitted = emitted + jnp.where(active & ~acc, cur_acc + n + 1, 0)
            emit_cnt = emit_cnt + jnp.where(active & ~acc, 1, 0)
            cur_acc2 = jnp.where(acc, cur_acc + n, 0)
            # finish emits the running counter (reference :690)
            emitted = emitted + jnp.where(active & fin, cur_acc2, 0)
            emit_cnt = emit_cnt + jnp.where(active & fin, 1, 0)
            cur_acc = jnp.where(active, jnp.where(fin, 0, cur_acc2), cur_acc)

            length = jnp.where(active, new_len, length)
            pre = jnp.where(active, ~acc, pre)
            finished = finished | (fin & active)
            return (i + 1, dkv, tkv, tokens, length, pre, finished, cur_acc, emitted, emit_cnt)

        init = (
            jnp.int32(0), dkv, tkv, tokens, length, pre, finished, cur_acc, emitted, emit_cnt,
        )
        (i, dkv, tkv, tokens, length, pre, finished, cur_acc, emitted, emit_cnt) = (
            jax.lax.while_loop(cond, body, init)
        )
        return dkv, tkv, tokens, length, pre, finished, cur_acc, emitted, emit_cnt, i

    # --------------------------------------------------------------- AR

    def _ar_rounds_impl(
        self, tparams, trope, tkv, tokens, length, finished, bt_t, temps, max_tokens,
        ignore_eos, prompt_len, eos_ids, tk, tp, num_steps, seed0,
        *, greedy_only=False, filtered=False,
    ):
        """num_steps target-only greedy/temperature decode steps in one
        program (the fused counterpart of reference step(), :319-331)."""
        tcfg, tr = self.target.cfg, self.target
        bs = self.block_size

        def cond(carry):
            i, _, _, _, finished = carry
            return (i < num_steps) & ~jnp.all(finished)

        def body(carry):
            i, tkv, tokens, length, finished = carry
            last = jnp.take_along_axis(tokens, jnp.clip(length - 1, 0)[:, None], axis=1)[:, 0]
            pos = length - 1
            slots = _row_slots(bt_t, pos[:, None], bs)[:, 0]
            hidden, tkv = tr._forward(
                tcfg, tparams, tkv, last, pos, slots, trope,
                tr._attn_decode, (bt_t, length), kv_write_fn=tr._kv_write,
            )
            logits = compute_logits(tcfg, tparams, hidden)
            if greedy_only:
                nxt = greedy(logits)
            else:
                if filtered:
                    logits = apply_top_k_top_p(logits, tk, tp, temps)
                nxt = sample(logits, temps, jax.random.key(seed0 + i))
            active = ~finished
            tokens = jax.vmap(
                lambda row, t, l: jax.lax.dynamic_update_slice(row, t[None], (l,))
            )(tokens, jnp.where(active, nxt, 0), length)
            length = jnp.where(active, length + 1, length)
            stops = eos_ids if eos_ids.ndim == 2 else eos_ids[None, :]
            is_eos = (nxt[:, None] == stops).any(-1)
            fin = ((~ignore_eos) & is_eos) | (length - prompt_len >= max_tokens)
            finished = finished | (fin & active)
            return (i + 1, tkv, tokens, length, finished)

        init = (jnp.int32(0), tkv, tokens, length, finished)
        i, tkv, tokens, length, finished = jax.lax.while_loop(cond, body, init)
        return tkv, tokens, length, finished, i

    # ----------------------------------------------------------- host API

    @staticmethod
    def _filter_args(state):
        """(tk, tp, filtered): per-row top-k/top-p from the state dict;
        ``filtered`` is False (compiling the sort-free program) when every
        row has filtering disabled or the whole batch is greedy (argmax
        is invariant under the filter — its top-1 always survives)."""
        greedy_only = bool(np.all(np.asarray(state["temps"]) == 0.0))
        tk, tp = state["tk"], state["tp"]
        filtered = not greedy_only and bool(
            np.any(np.asarray(tk) > 0) or np.any(np.asarray(tp) < 1.0)
        )
        return tk, tp, filtered, greedy_only

    def run_pearl(self, state: dict, gamma: int, num_rounds: int, seed0: int):
        """state: dict of np/device arrays (see orchestrator); returns the
        updated dict. One dispatch regardless of num_rounds."""
        tk, tp, filtered, greedy_only = self._filter_args(state)
        out = self._jit_pearl(
            self.draft.params, self.target.params,
            (self.draft.rope_table, self.target.rope_table),
            self.draft.kv, self.target.kv,
            state["tokens"], state["length"], state["pre"], state["finished"],
            state["cur_acc"], state["emitted"], state["emit_cnt"],
            state["bt_d"], state["bt_t"], state["temps"], state["max_tokens"],
            state["ignore_eos"], state["prompt_len"], state["eos_ids"],
            tk, tp, np.int32(num_rounds), np.int64(seed0), gamma=gamma,
            greedy_only=greedy_only, filtered=filtered,
        )
        (self.draft.kv, self.target.kv) = out[0], out[1]
        keys = ["tokens", "length", "pre", "finished", "cur_acc", "emitted", "emit_cnt"]
        for k, v in zip(keys, out[2:9]):
            state[k] = v
        state["rounds_done"] = out[9]
        return state

    def run_ar(self, state: dict, num_steps: int, seed0: int):
        tk, tp, filtered, greedy_only = self._filter_args(state)
        out = self._jit_ar(
            self.target.params, self.target.rope_table,
            self.target.kv, state["tokens"], state["length"], state["finished"],
            state["bt_t"], state["temps"], state["max_tokens"], state["ignore_eos"],
            state["prompt_len"], state["eos_ids"], tk, tp,
            np.int32(num_steps), np.int64(seed0),
            greedy_only=greedy_only, filtered=filtered,
        )
        self.target.kv = out[0]
        for k, v in zip(["tokens", "length", "finished"], out[1:4]):
            state[k] = v
        state["rounds_done"] = out[4]
        return state
