"""User-facing engine (reference: nano_pearl/pearl_engine/pearl_engine.py).

Single-controller: no worker processes, no shared-memory RPC, no atexit
process reaping — the engine object directly owns the two GroupRunners
and the scheduler. API surface matches the reference:

    engine = PearlEngine(config)
    engine.add_request(prompt_or_token_ids, SamplingParams(...))
    texts, num_tokens, num_acc_tokens, elapsed = engine.generate()
    ... = engine.AR_generate()
    ... = engine.bench_generate(num_pearl_steps=100)
"""

from __future__ import annotations

import os
import time
from collections import deque

from nano_pearl_tpu.config import PearlConfig, SamplingParams
from nano_pearl_tpu.engine.pearl import PearlOrchestrator
from nano_pearl_tpu.engine.runner import GroupRunner
from nano_pearl_tpu.engine.scheduler import Scheduler
from nano_pearl_tpu.engine.sequence import Sequence
from nano_pearl_tpu.parallel.mesh import build_group_meshes
from nano_pearl_tpu.utils.logging import logger


class PearlEngine:
    def __init__(
        self,
        config: PearlConfig,
        *,
        draft_params: dict | None = None,
        target_params: dict | None = None,
    ):
        """``draft_params``/``target_params`` allow injecting in-memory
        weights (tests, weightless benchmarks); otherwise weights load
        from each model's checkpoint directory."""
        self.config = config
        from nano_pearl_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()
        # perf_profile is resolved per-runner (GroupRunner.__init__) from
        # config + explicit env overrides — no process-global env
        # mutation, so engines with different profiles coexist in one
        # process (profile validation: PearlConfig.__post_init__).
        draft_mesh, target_mesh = build_group_meshes(
            config.draft_tp, config.target_tp, config.devices, config.placement,
            draft_sp=config.draft_sp, target_sp=config.target_sp,
            draft_pp=config.draft_pp, target_pp=config.target_pp,
            draft_ep=config.draft_ep, target_ep=config.target_ep,
        )
        self.draft = GroupRunner(
            config, config.draft_config, draft_mesh, params=draft_params, seed=config.seed
        )
        self.target = GroupRunner(
            config, config.target_config, target_mesh,
            params=target_params, seed=config.seed + 1,
        )
        self.scheduler = Scheduler(config, self.draft.num_blocks, self.target.num_blocks)
        self.orchestrator = PearlOrchestrator(config, self.draft, self.target, self.scheduler)
        self.tokenizer = self._maybe_tokenizer()
        self._completed_requests = 0
        self._completed_tokens = 0
        # recent completions' (ttft, tpot, e2e) for stats percentiles
        self._lat = deque(maxlen=512)
        if config.gamma == -1:
            if config.gamma_profile_batches:
                self.orchestrator.auto_set_gamma(
                    batch_sizes=tuple(config.gamma_profile_batches)
                )
            else:
                self.orchestrator.auto_set_gamma()
        if config.warmup:
            self.warmup(
                batches=config.warmup if isinstance(config.warmup, tuple) else (1,)
            )
        logger.info("PearlEngine ready.", color="green")

    def _maybe_tokenizer(self):
        path = self.config.target_config.model_path
        if not path:
            return None
        if not any(
            os.path.exists(os.path.join(path, f))
            for f in ("tokenizer.json", "tokenizer.model", "tokenizer_config.json")
        ):
            return None
        try:
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(path, use_fast=True)
        except Exception as e:  # tokenizer is optional; token-id API still works
            logger.warning(f"tokenizer unavailable ({e}); pass token ids to add_request")
            return None

    # ----------------------------------------------------------------- API

    def add_request(self, prompt, sampling_params: SamplingParams | None = None):
        """reference: pearl_engine.py:109-121 (chat template + encode)."""
        sampling_params = sampling_params or SamplingParams()
        if isinstance(prompt, str):
            assert self.tokenizer is not None, "string prompts need a tokenizer"
            text = self.tokenizer.apply_chat_template(
                [{"role": "user", "content": prompt}],
                tokenize=False,
                add_generation_prompt=True,
            )
            prompt = self.tokenizer.encode(text)
        assert len(prompt) > 0
        assert len(prompt) + sampling_params.max_tokens <= self.config.max_model_len, (
            "prompt + max_tokens exceeds max_model_len"
        )
        seq = Sequence(list(prompt), sampling_params, self.config.kvcache_block_size)
        seq.t_submit = time.perf_counter()
        self.scheduler.add(seq)
        return seq.seq_id

    def _collect(self, seqs: list[Sequence]):
        seqs = sorted(seqs, key=lambda s: s.seq_id)
        token_ids = [s.completion_token_ids for s in seqs]
        num_acc = [list(s.num_acc_tokens) for s in seqs]
        texts = (
            [self.tokenizer.decode(t, skip_special_tokens=False) for t in token_ids]
            if self.tokenizer
            else [None] * len(seqs)
        )
        return texts, [len(t) for t in token_ids], num_acc, token_ids

    def generate(self):
        """PEARL generation (reference: pearl_engine.py:123-135)."""
        elapsed = self.orchestrator.generate_loop()
        texts, num_tokens, num_acc, _ = self._collect(self.scheduler.finished)
        self.scheduler.clear()
        return texts, num_tokens, num_acc, elapsed

    def generate_token_ids(self):
        """Like generate() but returns completion token id lists (for
        tokenizer-less use)."""
        elapsed = self.orchestrator.generate_loop()
        _, num_tokens, num_acc, token_ids = self._collect(self.scheduler.finished)
        self.scheduler.clear()
        return token_ids, num_tokens, num_acc, elapsed

    def AR_generate(self):
        """Target-only autoregressive baseline (reference: pearl_engine.py:137-150)."""
        elapsed = self.orchestrator.ar_loop()
        texts, num_tokens, _, _ = self._collect(self.scheduler.finished)
        self.scheduler.clear()
        return texts, num_tokens, None, elapsed

    def AR_generate_token_ids(self):
        elapsed = self.orchestrator.ar_loop()
        _, num_tokens, _, token_ids = self._collect(self.scheduler.finished)
        self.scheduler.clear()
        return token_ids, num_tokens, None, elapsed

    def bench_generate(self, num_pearl_steps: int = 100, reserve_steps: int | None = None):
        """Fixed-step throughput benchmark (reference: pearl_engine.py:152-164).
        ``reserve_steps``: reserve KV as if that many steps would run —
        a short warmup call then compiles the measured run's exact fused
        program (block-table width is a compiled shape)."""
        elapsed = self.orchestrator.bench_loop(num_pearl_steps, reserve_steps)
        running = [s for s in self.scheduler.running]
        texts, num_tokens, num_acc, _ = self._collect(running + self.scheduler.finished)
        self.scheduler.clear()
        return texts, num_tokens, num_acc, elapsed

    def AR_bench_generate(self, num_steps: int = 100, reserve_steps: int | None = None):
        """Fixed-step target-only AR benchmark — the baseline twin of
        bench_generate (same constant-batch protocol; the reference's AR
        baseline instead runs to max_tokens, pearl_engine.py:137-150)."""
        elapsed = self.orchestrator.ar_bench_loop(num_steps, reserve_steps)
        running = [s for s in self.scheduler.running]
        _, num_tokens, _, token_ids = self._collect(running + self.scheduler.finished)
        self.scheduler.clear()
        return token_ids, num_tokens, None, elapsed

    def warmup(self, batches=(1,), prompt_len: int = 16, rounds: int = 2):
        """Pre-compile the serving-path programs (prefill, fused PEARL
        chunk, verdict) for the given decode batch buckets by driving
        dummy requests through real serve rounds, then discarding all
        state (reference: warmup_model, pearl_model_runner.py:333-344).
        After this, a request at one of the warmed buckets pays zero
        compile latency — TTFT is pure compute."""
        from nano_pearl_tpu.utils.logging import logger as _log

        t0 = time.perf_counter()
        for b in batches:
            b = min(b, self.config.max_num_seqs)
            for i in range(b):
                self.add_request(
                    [2 + (i % 7)] * prompt_len,
                    SamplingParams(
                        temperature=0.0,
                        max_tokens=rounds * max(self.config.gamma, 1) + 2,
                        ignore_eos=True,
                    ),
                )
            while self.has_work:
                self.orchestrator.serve_round()
            self.scheduler.finished.clear()
        self.scheduler.clear()
        _log.info(f"warmup({batches}) compiled in {time.perf_counter() - t0:.1f} s")

    # ------------------------------------------------- continuous serving

    def submit(self, prompt, sampling_params: SamplingParams | None = None) -> int:
        """Queue a request for continuous-batching service (alias of
        add_request; requests join the running batch at the next
        serve_step — the capability the reference leaves as TODO,
        reference: README.md:110)."""
        return self.add_request(prompt, sampling_params)

    def serve_step(self, fused_rounds: int = 8, with_deltas: bool = False):
        """Advance the engine one scheduling iteration and return newly
        finished requests as (seq_id, completion_token_ids, num_acc_tokens).
        Mid-flight admission: requests submitted between calls join the
        batch in pre-verify state without draining it.

        With ``with_deltas`` the return is ``(done, deltas)`` where
        deltas is a list of (seq_id, new_token_ids, finished) exposing
        per-token streaming. Only the ROLLBACK-PROOF prefix is streamed:
        after an accepted round the committed stream's last gamma tokens
        are still unverified (the next verdict may truncate up to
        gamma-1 of them and substitute a revise token, _apply_verdict),
        so the stable frontier is len(target) - gamma; after a rejected
        round (pre_verify) the whole stream is verified. Streamed tokens
        are therefore final — a consumer never sees a retraction."""
        self.orchestrator.serve_round(fused_rounds)
        done = []
        deltas = []
        now = time.perf_counter()
        for seq in self.scheduler.finished:
            comp = seq.completion_token_ids
            done.append((seq.seq_id, comp, list(seq.num_acc_tokens)))
            if with_deltas:
                deltas.append((seq.seq_id, comp[seq.num_streamed :], True))
                seq.num_streamed = len(comp)
            self._completed_requests += 1
            self._completed_tokens += len(comp)
            if seq.t_submit is not None and seq.t_first is not None:
                self._lat.append((
                    seq.t_first - seq.t_submit,                       # TTFT
                    (now - seq.t_first) / max(1, len(comp) - 1),      # TPOT
                    now - seq.t_submit,                               # e2e
                ))
        self.scheduler.finished.clear()
        if not with_deltas:
            return done
        g = self.orchestrator.last_gamma
        for seq in self.scheduler.running:
            stable = len(seq.target) - (0 if seq.pre_verify else g)
            new = seq.target.token_ids[
                seq.num_prompt_tokens + seq.num_streamed : stable
            ]
            if new:
                deltas.append((seq.seq_id, new, False))
                seq.num_streamed += len(new)
        return done, deltas

    def cancel(self, request_id: int) -> bool:
        """Abort a queued or in-flight request; its KV blocks are freed
        and its partial output discarded. Safe between serve_steps (the
        fused state is rebuilt from the scheduler each round)."""
        return self.scheduler.cancel(request_id)

    def stats(self) -> dict:
        """Serving observability snapshot: queue/batch occupancy, KV
        block pools, and cumulative completion counters (beyond the
        reference, which only returns per-call tuples)."""
        sch = self.scheduler
        return {
            "waiting": len(sch.waiting),
            "running": len(sch.running),
            "draft_free_blocks": sch.draft_bm.num_free_blocks,
            "target_free_blocks": sch.target_bm.num_free_blocks,
            "completed_requests": self._completed_requests,
            "completed_tokens": self._completed_tokens,
            **self._latency_stats(),
        }

    def _latency_stats(self) -> dict:
        """TTFT / TPOT / end-to-end percentiles (seconds) over the last
        <=512 served completions. TTFT = submit -> first committed token
        (prefill sample); TPOT = mean inter-token time after the first.

        stats() is read from HTTP handler threads while the driver thread
        appends: snapshot the deque in one C-level call (list() never
        yields the GIL mid-copy) — iterating the live deque would raise
        'deque mutated during iteration'."""
        lat = list(self._lat)
        if not lat:
            return {}
        out = {}
        for i, name in enumerate(("ttft", "tpot", "e2e")):
            vals = sorted(v[i] for v in lat)
            out[f"{name}_p50_s"] = round(vals[len(vals) // 2], 4)
            out[f"{name}_p95_s"] = round(vals[min(len(vals) - 1, int(len(vals) * 0.95))], 4)
        return out

    @property
    def has_work(self) -> bool:
        return not self.scheduler.is_finished()

    def exit(self):
        """Reference parity (pearl_engine.py:98-106); nothing to tear down
        in single-controller JAX."""
        self.scheduler.clear()
