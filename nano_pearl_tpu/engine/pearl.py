"""PEARL orchestration: concurrent draft/target rounds + verify state machine.

This is the single-controller redesign of the reference's distributed
hot loop (reference: pearl_model_runner.py:414-478 pearl_generate /
pearl_bench_generate, :485-553 DraftModelRunner, :556-694
TargetModelRunner). Control flow per round:

    reference (2 process groups, NCCL rendezvous)     this engine (1 controller)
    ---------------------------------------------     --------------------------
    draft: gamma x (graph replay + bcast)             dispatch draft gamma-scan   (async)
    target: packed forward (graph replay)             dispatch target forward     (async)
    draft->target verify-group bcast of tokens        fetch draft tokens (host)
    target master: python verify loop                 dispatch vectorized verdict
    target->ALL bcast of verify_res                   fetch verdict (5 small vecs)
    each replica applies rollback/append              host applies to both views

The two dispatches at the top are issued back-to-back before any fetch,
so on disjoint sub-meshes the draft and target programs run concurrently
— the same overlap the reference gets from separate processes, without
replicated schedulers or an RPC bus.

Rollback never touches KV contents — accepted/rolled-back state is pure
length/block bookkeeping on the host (reference behaves identically:
block_manager.py:93-106).
"""

from __future__ import annotations

import time

import jax
import numpy as np

from nano_pearl_tpu.config import PearlConfig
from nano_pearl_tpu.engine.runner import GroupRunner, next_pow2
from nano_pearl_tpu.engine.scheduler import Scheduler, is_eos
from nano_pearl_tpu.engine.sequence import Sequence
from nano_pearl_tpu.utils.logging import logger


class PearlOrchestrator:
    def __init__(
        self,
        pcfg: PearlConfig,
        draft: GroupRunner,
        target: GroupRunner,
        scheduler: Scheduler,
    ):
        self.pcfg = pcfg
        self.draft = draft
        self.target = target
        self.scheduler = scheduler
        self._seed_counter = pcfg.seed * 1_000_003
        self._round = 0
        self.gamma_list: dict[int, int] | None = None
        # Acceptance-adaptive gamma (pcfg.gamma == -1 only; round-3
        # verdict item 3): the speed-ratio gamma (reference parity,
        # auto_set_gamma) never reacts to OBSERVED acceptance, so
        # low-acceptance workloads burn gamma-sized rollbacks every
        # round. We keep an EWMA estimate of the per-token draft/target
        # agreement probability p (inverted from committed tokens/round)
        # and re-pick gamma from a throughput model between fused chunks
        # / overlap rounds. _speeds: per-batch-size (draft, target)
        # decode rates from profiling, feeding the model's round-time
        # term.
        self._speeds: dict[int, tuple[float, float]] = {}
        self._p_ewma: float | None = None
        # Measured fused-chunk round times per (gamma, batch bucket):
        # _round_seen drops each key's first sample (program compile),
        # _round_best keeps the min of the rest (_note_round_time).
        self._round_best: dict[tuple[int, int], float] = {}
        self._round_seen: set[tuple[int, int]] = set()
        # Per-gamma EWMA of observed committed tokens/round (empirical
        # acceptance curve; _adapt_gamma prefers it over the geometric
        # model wherever a gamma has actually been run). Entries age:
        # _commit_age stamps the tick of the last refresh, and commit_est
        # decays stale anchors toward the geometric model so a regime
        # change does not rank unvisited gammas on dead measurements.
        self._commit_obs: dict[int, float] = {}
        self._commit_age: dict[int, int] = {}
        self._commit_tick = 0
        # Calibration override: when set, _pick_gamma returns it verbatim
        # (bench warmup measures a second ladder point so the round-time
        # fit has a real slope instead of the dispatch-profiled one).
        self.force_gamma: int | None = None
        # Candidate ladder: each gamma is a separately compiled program —
        # bound the compile surface (persistent cache amortizes).
        self._gamma_ladder = (1, 2, 3, 4, 6, 8, 10, 12, 14, 16)
        # gamma of the most recent serve_round: bounds the committed
        # stream's unverified tail for token streaming (engine.serve_step
        # with_deltas); 0 until a round has run (post-prefill state is
        # fully verified).
        self.last_gamma = 0

        # Disjoint-across-hosts placement (parallel/distributed.py): a
        # controller dispatches only the group(s) whose devices it owns;
        # each group's per-round outputs reach the other hosts through a
        # DCN-level broadcast (the reference's verify-group broadcast,
        # pearl_model_runner.py:523-526).
        from nano_pearl_tpu.parallel import distributed as dist

        self.owns_draft = draft.is_local
        self.owns_target = target.is_local
        self._bc_draft = dist.is_multihost() and not dist.mesh_spans_all(
            draft.gmesh.mesh
        )
        self._bc_target = dist.is_multihost() and not dist.mesh_spans_all(
            target.gmesh.mesh
        )
        self._draft_src = dist.owner_process(draft.gmesh.mesh)
        self._target_src = dist.owner_process(target.gmesh.mesh)

        from nano_pearl_tpu.engine.fused import FusedPearl

        # The fused AR loop touches only the target group, so it is valid
        # on any placement whose target mesh this controller can fully
        # drive; the fused PEARL loop needs one program spanning both
        # models (shared device set).
        self._fused_impl = FusedPearl(pcfg, draft, target)
        self.fused: FusedPearl | None = None
        if pcfg.execution_mode in ("auto", "fused"):
            if FusedPearl.compatible(draft, target):
                self.fused = self._fused_impl
                logger.info("fused on-device loop enabled (shared device set)")
            elif pcfg.execution_mode == "fused":
                raise ValueError(
                    "execution_mode='fused' needs draft and target on the "
                    "same device set; use 'overlap' for disjoint sub-meshes"
                )

    def _next_seed(self) -> int:
        self._seed_counter += 1
        return self._seed_counter

    def _from_draft(self, arr):
        """Draft-group output on every controller (no-op unless the draft
        mesh is remote to some process; non-owners pass a same-shape
        placeholder)."""
        if not self._bc_draft:
            return np.asarray(arr)
        from nano_pearl_tpu.parallel import distributed as dist

        return dist.sync_from(self._draft_src, arr)

    def _from_target(self, arr):
        if not self._bc_target:
            return np.asarray(arr)
        from nano_pearl_tpu.parallel import distributed as dist

        return dist.sync_from(self._target_src, arr)

    def _sync(self):
        """Block until both groups' device state is final (the timing
        equivalent of the reference's torch.cuda.synchronize brackets,
        :427, :462)."""
        if self.draft.kv is not None:
            jax.block_until_ready(self.draft.kv)
        if self.target.kv is not None:
            jax.block_until_ready(self.target.kv)

    @staticmethod
    def _tk_tp(seqs, b_pad):
        """Per-row top_k/top_p arrays, or (None, None) when every row has
        filtering disabled (keeps the unfiltered compiled programs)."""
        if all(s.top_k <= 0 and s.top_p >= 1.0 for s in seqs):
            return None, None
        tk = np.zeros((b_pad,), np.int32)
        tp = np.ones((b_pad,), np.float32)
        for i, s in enumerate(seqs):
            tk[i] = max(s.top_k, 0)
            tp[i] = min(s.top_p, 1.0)
        return tk, tp

    def _m_pad(self, views) -> int:
        m = max(len(v.block_table) for v in views)
        return min(next_pow2(max(m, 8)), self.pcfg.max_blocks_per_seq)

    def _m_pad_tight(self, views) -> int:
        """Prefill block-table width: NO floor of 8. The jnp prefill
        attention materializes score tiles over m*block_size keys, so the
        floor cost 16x wasted HBM traffic on short prompts (the decode/
        verify kernels clamp past-context DMAs instead — see
        ops/pallas/paged_attention.py — and keep the floor for compiled-
        program-cache stability)."""
        m = max(len(v.block_table) for v in views)
        return min(next_pow2(m), self.pcfg.max_blocks_per_seq)

    # ------------------------------------------------------------- prefill

    def prefill_all(self, target_only: bool = False, strict: bool = True):
        """Prefill every waiting request, in as many admission batches as
        needed (the reference assumes a single batch: pearl_generate calls
        prefill() once, :418). Each group samples its own first token from
        its own logits (reference: prefill() runs per group, :307-317);
        finish-on-EOS follows the committed target stream only. With
        ``strict=False`` (continuous serving) a seat/block-limited
        admission simply leaves the remainder waiting for a later round
        instead of asserting."""
        while self.scheduler.waiting:
            seqs = self.scheduler.schedule_prefill()
            if not seqs and not strict:
                return
            assert seqs, "prefill admission made no progress (out of KV blocks?)"
            self._drain_oversized(seqs, target_only)
            b = len(seqs)
            b_pad = self.pcfg.prefill_bucket_batch(b)
            lq_d = max(len(s.draft) - s.draft.num_cached_tokens for s in seqs)
            lq_t = max(len(s.target) - s.target.num_cached_tokens for s in seqs)
            temps = np.zeros((b_pad,), np.float32)
            temps[:b] = [s.temperature for s in seqs]

            logits_d = logits_t = None
            # no prefix-cache hits -> the fresh-KV self-attention prefill
            # (no cache read; see runner._prefill_self_impl)
            fresh_d = all(s.draft.num_cached_tokens == 0 for s in seqs)
            fresh_t = all(s.target.num_cached_tokens == 0 for s in seqs)
            if not target_only and self.owns_draft:
                logits_d = self.draft.prefill(
                    [s.draft for s in seqs],
                    self.pcfg.bucket_tokens(lq_d),
                    b_pad,
                    self._m_pad_tight([s.draft for s in seqs]),
                    fresh_only=fresh_d,
                )
            if self.owns_target:
                logits_t = self.target.prefill(
                    [s.target for s in seqs],
                    self.pcfg.bucket_tokens(lq_t),
                    b_pad,
                    self._m_pad_tight([s.target for s in seqs]),
                    fresh_only=fresh_t,
                )
            tk, tp = self._tk_tp(seqs, b_pad)
            seed = self._next_seed()
            toks_t = (
                np.asarray(
                    self.target.sample_tokens(
                        logits_t, temps, seed, top_ks=tk, top_ps=tp
                    )
                )
                if self.owns_target
                else np.zeros((b_pad,), np.int32)
            )
            toks_t = self._from_target(toks_t)
            # The committed (target) sample seeds BOTH streams. The reference
            # has each group sample its own first token (:313-314) because
            # its processes cannot cheaply share it — leaving an unverified
            # draft-only token at the first completion position forever.
            # Single-controller, we condition the draft on the committed
            # token instead: draft and target streams are then identical
            # after every verify-apply (the invariant the fused on-device
            # loop relies on).
            t_now = time.perf_counter()
            for i, seq in enumerate(seqs):
                if not target_only:
                    seq.draft.append(int(toks_t[i]))
                seq.target.append(int(toks_t[i]))
                if seq.t_first is None:
                    seq.t_first = t_now  # first committed token: TTFT stamp
            # finish check on the committed stream (reference: postprocess,
            # scheduler.py:74-81)
            for i, seq in enumerate(list(seqs)):
                tok = int(toks_t[i])
                stopped = is_eos(tok, self.scheduler.eos) or tok in seq.stop_token_ids
                if (not seq.ignore_eos and stopped) or (
                    seq.num_completion_tokens == seq.max_tokens
                ):
                    self.scheduler.finish(seq)

    def _drain_oversized(self, seqs, target_only: bool):
        """Chunked prefill: a prompt longer than max_num_batched_tokens
        (admitted ALONE by the scheduler) is prefilled in block-aligned
        chunk passes whose logits are discarded; only the final <= chunk
        tokens go through the normal sampling pass in prefill_all. Chunk
        boundaries stay block-aligned so every non-first pass takes the
        pre-gathered prefix-merge program (runner._prefill_prefix_impl) —
        the already-written chunks play the role of a prefix-cache hit.
        Beyond the reference (its scheduler cannot admit such prompts:
        scheduler.py:39). v1 note: each pass re-gathers the full cached
        prefix ([L, 1, S_pre, Hkv, D]) — KV-sized, not activation-sized;
        a paged-prefix Pallas prefill kernel would remove even that."""
        bs = self.scheduler.block_size
        budget = self.pcfg.max_num_batched_tokens
        chunk = (budget // bs) * bs

        def drain(runner, view):
            # drains to <= chunk (<= budget); the final <= budget tokens go
            # through the batch's normal sampling pass. Trigger on budget,
            # not chunk: with a non-block-multiple budget a remainder in
            # (chunk, budget] fits the normal pass directly. Non-owner
            # controllers (disjoint multi-host) advance only the host
            # bookkeeping — no logits leave a chunk pass, so there is
            # nothing to broadcast.
            while len(view) - view.num_cached_tokens > chunk:
                if runner.is_local:
                    runner.prefill(
                        [view],
                        self.pcfg.bucket_tokens(chunk),
                        self.pcfg.prefill_bucket_batch(1),
                        self._m_pad_tight([view]),
                        fresh_only=view.num_cached_tokens == 0,
                        limit=chunk,
                    )
                view.num_cached_tokens += chunk

        for s in seqs:
            pairs = [(self.target, s.target)]
            if not target_only:
                pairs.insert(0, (self.draft, s.draft))
            # per-view, not per-batch: a re-admitted preempted sequence's
            # DRAFT view can run up to gamma tokens past its target view
            # (only len(target) drives the scheduler's oversized check),
            # so a multi-seq batch may still contain one view to drain.
            for runner, v in pairs:
                if len(v) - v.num_cached_tokens > budget:
                    drain(runner, v)

    # --------------------------------------------------------------- rounds

    def pearl_round(self, gamma: int):
        """One PEARL step across both groups (reference: pearl_step)."""
        sch = self.scheduler
        seqs = sch.schedule_decode(lookahead=gamma + 1)
        b = len(seqs)
        b_pad = self.pcfg.bucket_batch(b)
        is_pre = np.zeros((b_pad,), bool)
        is_pre[:b] = [s.pre_verify for s in seqs]

        draft_views = [s.draft for s in seqs]
        target_views = [s.target for s in seqs]

        # 1+2: dispatch both groups back-to-back (concurrent on disjoint
        # meshes; on disjoint HOSTS each controller dispatches only its
        # own group and the two run concurrently by process parallelism)
        toks_dev = (
            self.draft.gamma_scan(
                draft_views, gamma, b_pad, self._m_pad(draft_views),
                is_pre=is_pre,
            )
            if self.owns_draft
            else None
        )
        logits_dev = (
            self.target.verify_forward(
                target_views, is_pre, gamma, b_pad, self._m_pad(target_views)
            )
            if self.owns_target
            else None
        )

        # 3: fetch draft tokens — [gamma, b_pad] -> [b, gamma] — and share
        # them with every controller (the reference's verify-group
        # broadcast, :523)
        g_toks = (
            np.asarray(toks_dev).T[:b]
            if toks_dev is not None
            else np.zeros((b, gamma), np.int32)
        )
        g_toks = self._from_draft(g_toks)

        # 4: build the to-be-verified window. The target's forward over its
        # last-appended tokens yields logits predicting the NEXT positions,
        # i.e. the previous draft round shifted by one plus the first token
        # of the current round (reference: :518-521).
        tbv = np.zeros((b_pad, gamma), np.int32)
        for i, seq in enumerate(seqs):
            if is_pre[i]:
                tbv[i, 0] = g_toks[i, 0]
            else:
                tail = seq.draft.token_ids[-(gamma - 1):] if gamma > 1 else []
                tbv[i, : gamma - 1] = tail
                tbv[i, gamma - 1] = g_toks[i, 0]

        # 5: commit this round's draft tokens to the draft view
        for i, seq in enumerate(seqs):
            for t in g_toks[i]:
                seq.draft.append(int(t))

        # 6: verdict on the target mesh
        num_completion = np.full((b_pad,), 0, np.int64)
        max_tokens = np.full((b_pad,), np.iinfo(np.int64).max // 2, np.int64)
        ignore_eos = np.ones((b_pad,), bool)
        temps = np.zeros((b_pad,), np.float32)
        for i, s in enumerate(seqs):
            num_completion[i] = s.num_completion_tokens
            max_tokens[i] = min(s.max_tokens, np.iinfo(np.int64).max // 2)
            ignore_eos[i] = s.ignore_eos
            temps[i] = s.temperature
        tk, tp = self._tk_tp(seqs, b_pad)
        stops = None
        if any(s.stop_token_ids for s in seqs):
            # per-request stop matrix: global EOS plus this request's
            # stops, -1 padded (never matches a real token id)
            eos = self.scheduler.eos
            width = len(eos) + max(len(s.stop_token_ids) for s in seqs)
            stops = np.full((b_pad, width), -1, np.int32)
            stops[:, : len(eos)] = eos
            for i, s in enumerate(seqs):
                if s.stop_token_ids:
                    stops[i, len(eos) : len(eos) + len(s.stop_token_ids)] = (
                        s.stop_token_ids
                    )
        seed = self._next_seed()
        if self.owns_target:
            res = self.target.verdict(
                logits_dev, tbv, is_pre, temps, num_completion, max_tokens,
                ignore_eos, seed, gamma, top_ks=tk, top_ps=tp,
                stops=stops,
            )

            # 7: fetch the 5 verdict vectors
            acc = np.asarray(res.acc)[:b]
            rollout = np.asarray(res.rollout)[:b]
            revise = np.asarray(res.revise)[:b]
            finish = np.asarray(res.finish)[:b]
            n_acc = np.asarray(res.n_acc)[:b]
        else:
            acc = rollout = revise = finish = n_acc = np.zeros((b,), np.int64)
        if self._bc_target:
            # one packed broadcast (the reference's global verify_res
            # broadcast, :526/:662)
            packed = self._from_target(
                np.stack([
                    np.asarray(acc, np.int64), np.asarray(rollout, np.int64),
                    np.asarray(revise, np.int64), np.asarray(finish, np.int64),
                    np.asarray(n_acc, np.int64),
                ])
            )
            acc, rollout, revise, finish, n_acc = packed

        # 8: apply the state machine to both views
        lens0 = [len(s.target) for s in seqs]
        for i, seq in enumerate(seqs):
            self._apply_verdict(
                seq, bool(acc[i]), int(rollout[i]), int(revise[i]),
                bool(finish[i]), int(n_acc[i]), g_toks[i], gamma,
            )
        if seqs:
            # feed the adaptive-gamma estimator with this round's mean
            # committed-token growth (rejections may shrink a stream)
            delta = float(
                np.mean([len(s.target) - l0 for s, l0 in zip(seqs, lens0)])
            )
            self._note_commit_rate(delta, gamma)
        self._round += 1

    def _apply_verdict(self, seq: Sequence, acc: bool, rollout: int, revise: int,
                       finish: bool, n_acc: int, g_toks: np.ndarray, gamma: int):
        sch = self.scheduler
        was_pre = seq.pre_verify

        # MAT bookkeeping (reference: :626-656; emitted count includes the
        # revise token on rejection)
        if acc:
            seq.cur_acc_tokens += n_acc
        else:
            seq.num_acc_tokens.append(seq.cur_acc_tokens + n_acc + 1)
            seq.cur_acc_tokens = 0

        # ---- target view update (reference: :667-686) ----
        if acc:
            for t in g_toks:
                seq.target.append(int(t))
        else:
            if not was_pre and rollout > 1:
                sch.target_bm.rollback(seq.target, rollout - 1)
            seq.target.append(revise)

        # ---- draft view update (reference: :528-553) ----
        if finish:
            # reference target: :688-694 (append cur_acc, then retire)
            seq.num_acc_tokens.append(seq.cur_acc_tokens)
            seq.cur_acc_tokens = 0
            sch.finish(seq)
            return
        if acc:
            seq.pre_verify = False
        else:
            seq.pre_verify = True
            sch.draft_bm.rollback(seq.draft, gamma)
            if not was_pre and rollout > 1:
                sch.draft_bm.rollback(seq.draft, rollout - 1)
            seq.draft.append(revise)

    # ------------------------------------------------------------ generate

    def _pick_gamma(self) -> int:
        if self.pcfg.gamma != -1:
            return self.pcfg.gamma
        if self.force_gamma is not None:
            return self.force_gamma
        assert self.gamma_list, "gamma=-1 requires auto_set_gamma() first"
        b = len(self.scheduler.running)
        for bs in sorted(self.gamma_list):
            if bs >= b:
                return self._adapt_gamma(self.gamma_list[bs])
        return self._adapt_gamma(self.gamma_list[max(self.gamma_list)])

    # ------------------------------------------- acceptance-adaptive gamma

    @staticmethod
    def _expected_commit(gamma: int, p: float) -> float:
        """Long-run committed tokens per PEARL round under per-token
        agreement probability p: the geometric series 1 + p + ... +
        p^(gamma-1) (a rejection at position k still commits k accepted
        tokens plus the revise token; full agreement commits gamma)."""
        if p >= 0.9999:
            return float(gamma)
        return (1.0 - p**gamma) / (1.0 - p)

    def _estimate_p(self, m_obs: float, gamma: int) -> float:
        """Invert _expected_commit(gamma, .) = m_obs by bisection."""
        if m_obs >= gamma - 1e-6:
            return 1.0
        m_obs = max(m_obs, 0.05)
        lo, hi = 0.0, 0.99999
        for _ in range(40):
            mid = (lo + hi) / 2
            if self._expected_commit(gamma, mid) < m_obs:
                lo = mid
            else:
                hi = mid
        return (lo + hi) / 2

    def _note_commit_rate(self, tokens_per_round: float, gamma: int, rounds: int = 1):
        """Fold an observed committed-tokens/round sample (over ``rounds``
        rounds at draft window ``gamma``) into the p EWMA and the
        per-gamma empirical commit table."""
        if gamma < 1 or rounds < 1:
            return
        est = self._estimate_p(tokens_per_round, gamma)
        a = 1.0 - 0.75 ** min(rounds, 16)  # per-round alpha 0.25
        self._p_ewma = est if self._p_ewma is None else (
            (1 - a) * self._p_ewma + a * est
        )
        cur = self._commit_obs.get(gamma)
        self._commit_obs[gamma] = tokens_per_round if cur is None else (
            (1 - a) * cur + a * tokens_per_round
        )
        self._commit_tick += 1
        self._commit_age[gamma] = self._commit_tick

    def _note_round_time(self, gamma: int, b: int, seconds_per_round: float):
        """Fold a measured fused-chunk seconds/round sample into the
        per-(gamma, batch-bucket) table. The FIRST sample for each key is
        discarded — it carries the gamma's program compile — and later
        samples keep the minimum (tunnel/host contention only ever slows
        a chunk down, so min approaches the true device rate)."""
        key = (gamma, self.pcfg.bucket_batch(max(1, b)))
        if key not in self._round_seen:
            self._round_seen.add(key)
            return
        cur = self._round_best.get(key)
        self._round_best[key] = (
            seconds_per_round if cur is None else min(cur, seconds_per_round)
        )

    def _round_time_model(self, b: int):
        """T(gamma) for the current batch bucket. Prefers MEASURED fused
        chunk times (least-squares line over the observed gammas — the
        intercept absorbs verdict/bookkeeping fixed costs the dispatch-
        profiled rates can't see); falls back to the auto_set_gamma
        speed profile when fewer than two gammas have been measured."""
        bs_b = self.pcfg.bucket_batch(max(1, b))
        meas = {g: t for (g, b2), t in self._round_best.items() if b2 == bs_b}
        if len(meas) >= 2:
            gs = np.array(sorted(meas), np.float64)
            ts = np.array([meas[int(g)] for g in gs], np.float64)
            td, c = np.polyfit(gs, ts, 1)
            td = max(float(td), 1e-7)
            c = max(float(c), 1e-7)
            return lambda g: meas.get(g, c + td * g)
        if not self._speeds:
            return None
        bs = min(self._speeds, key=lambda k: abs(k - b))
        sd, st = self._speeds[bs]
        if sd <= 0 or st <= 0:
            return None
        td, tv = 1.0 / sd, 1.0 / st
        fused = self.fused is not None
        if meas:  # one sample: anchor the profile slope at it
            g0, t0 = next(iter(meas.items()))
            return lambda g: meas.get(g, max(t0 + (g - g0) * td, 1e-7))
        if fused:
            return lambda g: g * td + tv
        return lambda g: max(g * td, tv) + 0.25 * tv

    def _adapt_gamma(self, base_gamma: int) -> int:
        """Acceptance-aware gamma: maximize E[committed/round] / T(round).
        T(gamma) comes from _round_time_model — measured fused-chunk
        times once available (self-calibrating: includes every per-round
        fixed cost), else the auto_set_gamma speed profile. Hysteresis:
        switch only on a >=10% modeled gain (each gamma is its own
        compiled program)."""
        if self._p_ewma is None:
            return base_gamma
        b = max(1, len(self.scheduler.running))
        tmodel = self._round_time_model(b)
        if tmodel is None:
            return base_gamma
        p = self._p_ewma

        def obs_blend(g: int) -> float:
            """Observed commit EWMA at g, decayed toward the geometric
            model with staleness (half-life 64 notes): anchors measured
            under an earlier workload stop dominating after a regime
            change they never saw (advisor r4)."""
            geo = self._expected_commit(g, p)
            age = self._commit_tick - self._commit_age.get(g, self._commit_tick)
            w = 0.5 ** (age / 64.0)
            return w * self._commit_obs[g] + (1.0 - w) * geo

        def commit_est(g: int) -> float:
            """E[committed/round] at window g: the OBSERVED per-gamma
            EWMA when g has been run; otherwise the geometric model
            rescaled through the nearest observed gamma. Real acceptance
            is not i.i.d. geometric (divergence grows along the window;
            pre-verify rounds dilute small gammas), so the raw model
            systematically underestimates larger windows — anchoring on
            measurements fixes the ranking where it matters."""
            if g in self._commit_obs:
                return obs_blend(g)
            geo = self._expected_commit(g, p)
            if not self._commit_obs:
                return geo
            g0 = min(self._commit_obs, key=lambda k: abs(k - g))
            geo0 = max(self._expected_commit(g0, p), 1e-6)
            return min(float(g), geo * obs_blend(g0) / geo0)

        def score(g: int) -> float:
            return commit_est(g) / tmodel(g)

        best = max(self._gamma_ladder, key=score)
        if score(best) < 1.10 * score(base_gamma):
            return base_gamma
        if best != base_gamma:
            logger.info(
                f"adaptive gamma: {base_gamma} -> {best} "
                f"(p_hat {p:.3f}, bs {b})"
            )
        return best

    def generate_loop(self) -> float:
        """reference: pearl_generate (:414-438). Returns elapsed seconds."""
        start = time.perf_counter()
        self.prefill_all()
        while not self.scheduler.is_finished():
            gamma = self._pick_gamma() if self.scheduler.running else 1
            if self.fused is not None:
                self._fused_pearl_run(gamma, num_steps=None)
            else:
                while self.scheduler.running:
                    self.pearl_round(gamma)
                    if self.pcfg.gamma == -1 and self.scheduler.running:
                        gamma = self._pick_gamma()
            if self.scheduler.waiting:
                # seats/blocks freed by finished sequences: admit the
                # overflow (the strict assert guards real no-progress)
                self.prefill_all()
        self._sync()
        return time.perf_counter() - start

    def bench_loop(self, num_pearl_steps: int, reserve_steps: int | None = None) -> float:
        """reference: pearl_bench_generate (:440-478) — fixed step count,
        eos ignored and max_tokens unbounded so the batch size stays
        constant for the whole measurement.

        ``reserve_steps`` reserves KV blocks for that many rounds even
        when fewer are run: a short warmup pass with the measured run's
        reservation compiles the IDENTICAL fused program (the block-table
        width is a compiled shape), so the measured run starts warm."""
        start = time.perf_counter()
        self.prefill_all()
        for seq in self.scheduler.running:
            seq.max_tokens = 10**9
            seq.ignore_eos = True
        gamma = self._pick_gamma() if self.scheduler.running else 1
        self.last_gamma = gamma
        if self.fused is not None:
            self._fused_pearl_run(gamma, num_steps=num_pearl_steps,
                                  reserve_steps=reserve_steps)
        else:
            for _ in range(num_pearl_steps):
                self.pearl_round(gamma)
                if self.pcfg.gamma == -1 and self.scheduler.running:
                    gamma = self._pick_gamma()
        self._sync()
        elapsed = time.perf_counter() - start
        # acc counters of still-running seqs (reference: :466-468)
        for seq in self.scheduler.running:
            seq.num_acc_tokens.append(seq.cur_acc_tokens)
            seq.cur_acc_tokens = 0
        return elapsed

    def ar_bench_loop(self, num_steps: int, reserve_steps: int | None = None) -> float:
        """Fixed-step AR baseline (the AR twin of bench_loop): prefill,
        then exactly ``num_steps`` decode steps with eos ignored so batch
        size stays constant. ``reserve_steps`` pre-reserves blocks for a
        longer run so a short warmup compiles the measured run's exact
        fused program (same block-table width)."""
        start = time.perf_counter()
        self.prefill_all(target_only=True)
        for seq in self.scheduler.running:
            seq.max_tokens = 10**9
            seq.ignore_eos = True
        # disjoint multi-host: the fused AR device state machine lives on
        # the target mesh only — non-owner controllers cannot follow its
        # mid-run fetches, so all hosts take the per-step path
        fused_ar = self.pcfg.execution_mode != "overlap" and not self._bc_target
        cap = max(num_steps, reserve_steps or 0) + 2
        # target-only reservation: the draft never decodes in AR mode
        seqs = self.scheduler.schedule_decode(
            lookahead=lambda s: cap, ar_only=True, strict=False
        ) if self.scheduler.running else []
        if seqs and fused_ar:
            state = self._build_fused_state(seqs, ar_only=True)
            remaining = num_steps
            while remaining > 0:
                # capped per-dispatch steps (config.max_dispatch_steps):
                # one long-running execution crashes the axon worker
                chunk = min(remaining, self.pcfg.max_dispatch_steps)
                state = self._fused_impl.run_ar(state, chunk, self._next_seed() * 100003)
                remaining -= chunk
                if remaining > 0 and bool(np.asarray(state["finished"]).all()):
                    break
            self._fused_sync(seqs, state, ar_only=True)
        elif seqs:
            for _ in range(num_steps):
                views = [s.target for s in seqs]
                for v in views:
                    self.scheduler.target_bm.ensure_capacity(v, 1)
                b = len(seqs)
                b_pad = self.pcfg.bucket_batch(b)
                temps = np.zeros((b_pad,), np.float32)
                temps[:b] = [s.temperature for s in seqs]
                seed = self._next_seed()
                if self.owns_target:
                    logits = self.target.decode(views, b_pad, self._m_pad(views))
                    toks = np.asarray(
                        self.target.sample_tokens(logits, temps, seed)
                    )
                else:
                    toks = np.zeros((b_pad,), np.int32)
                toks = self._from_target(toks)
                for v, t in zip(views, toks[:b]):
                    v.append(int(t))
        self._sync()
        return time.perf_counter() - start

    def ar_loop(self) -> float:
        """Target-only autoregressive baseline (reference: AR_generate /
        parallel_generate :393-412 — the reference also runs the draft
        group but discards its output; we skip that waste)."""
        start = time.perf_counter()
        self.prefill_all(target_only=True)
        fused_ar = self.pcfg.execution_mode != "overlap" and not self._bc_target
        if fused_ar:
            while not self.scheduler.is_finished():
                self._fused_ar_run()
                if self.scheduler.waiting:
                    # seats freed by finished sequences: admit the overflow
                    self.prefill_all(target_only=True)
        else:
            while not self.scheduler.is_finished():
                if not self.scheduler.running:
                    self.prefill_all(target_only=True)
                seqs = self.scheduler.schedule_decode(lookahead=1)
                b = len(seqs)
                b_pad = self.pcfg.bucket_batch(b)
                views = [s.target for s in seqs]
                temps = np.zeros((b_pad,), np.float32)
                temps[:b] = [s.temperature for s in seqs]
                tk, tp = self._tk_tp(seqs, b_pad)
                seed = self._next_seed()
                if self.owns_target:
                    logits = self.target.decode(views, b_pad, self._m_pad(views))
                    toks = np.asarray(
                        self.target.sample_tokens(
                            logits, temps, seed, top_ks=tk, top_ps=tp
                        )
                    )
                else:
                    toks = np.zeros((b_pad,), np.int32)
                toks = self._from_target(toks)
                self.scheduler.postprocess_ar(seqs, [int(t) for t in toks[:b]])
        self._sync()
        return time.perf_counter() - start

    # ------------------------------------------------------ fused execution

    def _build_fused_state(self, seqs, ar_only: bool = False) -> dict:
        """Materialize the device state machine for the fused loop. KV
        growth must already be reserved by the caller (schedule_decode
        with a per-seq capacity callable — the fused program cannot call
        the host allocator mid-loop)."""
        pcfg = self.pcfg
        b = len(seqs)
        b_pad = pcfg.bucket_batch(b)
        lbuf = pcfg.max_model_len + 8 * (pcfg.gamma if pcfg.gamma > 0 else 8) + 64

        def tables(views, garbage):
            m = max(len(v.block_table) for v in views)
            m = next_pow2(max(m, 8))
            bt = np.full((b_pad, m), garbage, np.int32)
            for i, v in enumerate(views):
                bt[i, : len(v.block_table)] = v.block_table
            return bt

        tokens = np.zeros((b_pad, lbuf), np.int32)
        length = np.ones((b_pad,), np.int32)
        prompt_len = np.ones((b_pad,), np.int32)
        pre = np.zeros((b_pad,), bool)
        finished = np.ones((b_pad,), bool)  # padding rows stay finished
        temps = np.zeros((b_pad,), np.float32)
        max_tokens = np.full((b_pad,), 2**30, np.int32)
        ignore_eos = np.ones((b_pad,), bool)
        cur_acc = np.zeros((b_pad,), np.int32)
        tk = np.zeros((b_pad,), np.int32)
        tp = np.ones((b_pad,), np.float32)
        for i, s in enumerate(seqs):
            stream = s.target.token_ids
            tokens[i, : len(stream)] = stream
            length[i] = len(stream)
            prompt_len[i] = s.num_prompt_tokens
            pre[i] = s.pre_verify
            finished[i] = False
            temps[i] = s.temperature
            max_tokens[i] = min(s.max_tokens, 2**30)
            ignore_eos[i] = s.ignore_eos
            cur_acc[i] = s.cur_acc_tokens
            tk[i] = max(s.top_k, 0)
            tp[i] = min(s.top_p, 1.0)
        # stop set: the global EOS list [E], widened to a per-request
        # [B, S] matrix (EOS + request stop_token_ids, -1 padded) when any
        # live request carries stops — verify_verdict and the fused AR
        # body accept either shape
        eos = [int(t) for t in self.target.cfg.eos_ids]
        if any(s.stop_token_ids for s in seqs):
            width = len(eos) + max(len(s.stop_token_ids) for s in seqs)
            eos_ids = np.full((b_pad, width), -1, np.int32)
            eos_ids[:, : len(eos)] = eos
            for i, s in enumerate(seqs):
                if s.stop_token_ids:
                    eos_ids[i, len(eos) : len(eos) + len(s.stop_token_ids)] = (
                        list(s.stop_token_ids)
                    )
        else:
            eos_ids = np.asarray(eos, np.int32)
        state = {
            "tokens": tokens,
            "length": length,
            "pre": pre,
            "finished": finished,
            "cur_acc": cur_acc,
            "emitted": np.zeros((b_pad,), np.int32),
            "emit_cnt": np.zeros((b_pad,), np.int32),
            "bt_d": None if ar_only else tables([s.draft for s in seqs], self.draft.garbage_block),
            "bt_t": tables([s.target for s in seqs], self.target.garbage_block),
            "temps": temps,
            "max_tokens": max_tokens,
            "ignore_eos": ignore_eos,
            "prompt_len": prompt_len,
            "eos_ids": eos_ids,
            "tk": tk,
            "tp": tp,
        }
        # Commit every state array to the mesh (replicated) BEFORE the
        # first dispatch: chunk 1 would otherwise take uncommitted host
        # arrays while chunk 2+ takes the previous dispatch's committed
        # device outputs — a different jit signature, i.e. a full
        # recompile of the fused program mid-measurement (observed as a
        # second jit__pearl_rounds_impl executable per run; diagnosed
        # with JAX_EXPLAIN_CACHE_MISSES: "at finished, now
        # bool[32]({Auto: ('tp',)}) and before bool[32]({})").
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.target.gmesh.mesh, P())
        return jax.device_put(state, jax.tree.map(lambda _: rep, state))

    # The fused run is split into dispatch/probe/finish phases so a
    # caller that owns SEVERAL orchestrators on disjoint device slices
    # (engine/dp.py) can interleave their chunk dispatches — each
    # replica's program runs concurrently on its own hardware while the
    # host round-robins (the same async-dispatch overlap mechanism the
    # draft||target groups use).

    def _fused_chunk_rounds(self, gamma: int, b: int) -> int:
        """Rounds per fused dispatch in variable-length mode: big enough
        to amortize the per-chunk host sync, small enough that one
        chunk's whole-batch reservation fits in ~half the smaller KV pool
        (round-1 weakness 5: the unchunked run reserved worst-case
        max_tokens blocks up front and asserted when they didn't fit)."""
        pool_tokens = (
            min(self.scheduler.draft_bm.num_blocks, self.scheduler.target_bm.num_blocks)
            * self.pcfg.kvcache_block_size
        )
        per_chunk_round = (gamma + 1) * max(1, b)
        return max(1, min(128, pool_tokens // (2 * per_chunk_round)))

    def start_fused(self, gamma: int, num_steps: int | None = None,
                    reserve_steps: int | None = None):
        """Reserve KV growth (preempting under pressure — preempted
        requests requeue instead of crashing the engine) and build the
        device state machine; returns an opaque run handle (None when
        nothing could be scheduled). ``reserve_steps`` (bench warmup)
        sizes the block reservation as if that many rounds would run."""
        if not self.scheduler.running:
            return None
        if num_steps is not None:
            cap_steps = max(num_steps, reserve_steps or 0)
            cap_fn = lambda s: cap_steps * gamma + 2 * gamma + 4
            chunk = None
        else:
            # chunked reservation: blocks for one chunk of rounds at a
            # time; step_fused re-reserves between chunks from device
            # lengths (growth stays bounded by max_tokens regardless)
            chunk = self._fused_chunk_rounds(gamma, len(self.scheduler.running))
            cap_fn = lambda s: (
                min(s.max_tokens - s.num_completion_tokens, chunk * gamma)
                + 2 * gamma + 4
            )
        seqs = self.scheduler.schedule_decode(
            lookahead=cap_fn, strict=False
        )
        if not seqs:
            return None
        if num_steps is not None:
            rounds_bound = num_steps
        else:
            rounds_bound = max(s.max_tokens - s.num_completion_tokens for s in seqs) + 1
        state = self._build_fused_state(seqs)
        return {
            "seqs": seqs, "state": state, "gamma": gamma,
            "remaining": rounds_bound, "fixed": num_steps is not None,
            "chunk": chunk, "dev_len": None, "stalled": False,
            # adaptive-gamma bookkeeping: per-chunk committed-token
            # growth over rows still live at the previous probe
            "prev_len": np.asarray([len(s.target.token_ids) for s in seqs]),
            "prev_fin": np.zeros((len(seqs),), bool),
        }

    def _reensure_fused(self, run) -> bool:
        """Between chunks of a variable-length fused run: grow every
        unfinished row's block reservation for the next chunk, using the
        device lengths fetched by the last probe. False when the pools
        cannot hold the next chunk — the caller must sync and reschedule
        (which preempts) instead of asserting."""
        sch = self.scheduler
        gamma, chunk = run["gamma"], run["chunk"]
        dev_len = run["dev_len"]
        dev_fin = run["dev_fin"]
        grow = []
        for i, s in enumerate(run["seqs"]):
            if dev_fin[i]:
                continue
            base = len(s.target.token_ids)  # host view is stale mid-run
            extra = int(dev_len[i]) - base + min(
                s.max_tokens - (int(dev_len[i]) - s.num_prompt_tokens),
                chunk * gamma,
            ) + 2 * gamma + 4
            grow.append((s, max(0, extra)))
        for s, extra in grow:
            if not (
                sch.draft_bm.can_ensure(s.draft, extra)
                and sch.target_bm.can_ensure(s.target, extra)
            ):
                return False
        for s, extra in grow:
            sch.draft_bm.ensure_capacity(s.draft, extra)
            sch.target_bm.ensure_capacity(s.target, extra)
        # refresh the device block tables (widths may grow -> the dict
        # update hands the new arrays to the next dispatch)
        state = run["state"]
        b_pad = state["length"].shape[0]

        def tables(views, garbage):
            m = max(len(v.block_table) for v in views)
            m = next_pow2(max(m, 8))
            bt = np.full((b_pad, m), garbage, np.int32)
            for i, v in enumerate(views):
                bt[i, : len(v.block_table)] = v.block_table
            return bt

        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.target.gmesh.mesh, P())
        state["bt_d"] = jax.device_put(
            tables([s.draft for s in run["seqs"]], self.draft.garbage_block), rep
        )
        state["bt_t"] = jax.device_put(
            tables([s.target for s in run["seqs"]], self.target.garbage_block), rep
        )
        return True

    def step_fused(self, run) -> bool:
        """Dispatch one chunk of rounds (async — returns without waiting
        for the device). True when no further chunks remain (or the run
        stalled on KV pressure — check ``run['stalled']``; the ended
        run's preempted/unfinished rows simply reschedule next call)."""
        if not run["fixed"] and run["dev_len"] is not None:
            if not self._reensure_fused(run):
                run["stalled"] = True
                return True
        cap = self.pcfg.max_dispatch_rounds
        chunk = min(run["remaining"], cap if run["fixed"] else min(run["chunk"], cap))
        run["state"] = self.fused.run_pearl(
            run["state"], run["gamma"], chunk, self._next_seed() * 100003
        )
        run["remaining"] -= chunk
        return run["remaining"] <= 0

    def probe_fused(self, run) -> bool:
        """Host sync on this run's device stream: all rows finished?
        Also snapshots per-row lengths for the next chunk's block
        re-reservation, and feeds the adaptive-gamma estimator with the
        chunk's committed-token rate."""
        fetched = jax.device_get({
            "finished": run["state"]["finished"],
            "length": run["state"]["length"],
            "rounds": run["state"].get("rounds_done", np.int32(0)),
        })
        run["dev_len"] = fetched["length"]
        run["dev_fin"] = fetched["finished"]
        b = len(run["seqs"])
        rounds = int(fetched["rounds"])
        live = ~run["prev_fin"]
        if rounds > 0 and live.any():
            delta = float(
                np.mean(fetched["length"][:b][live] - run["prev_len"][live])
            )
            self._note_commit_rate(delta / rounds, run["gamma"], rounds)
        run["prev_len"] = np.asarray(fetched["length"][:b])
        run["prev_fin"] = np.asarray(fetched["finished"][:b])
        run["last_rounds"] = rounds
        return bool(fetched["finished"].all())

    def end_fused(self, run):
        self._fused_sync(run["seqs"], run["state"])

    def _fused_pearl_run(self, gamma: int, num_steps: int | None,
                         reserve_steps: int | None = None):
        """Run PEARL to completion (num_steps=None) or for a fixed number
        of rounds, with at most one host sync per chunk. Under KV
        pressure a variable-length run may stall mid-flight: it syncs
        back and restarts (rescheduling preempts to make room).

        With pcfg.gamma == -1 the observed acceptance re-picks gamma at
        chunk boundaries (_adapt_gamma): a proposed switch ends the run
        (syncing device state back) and restarts with the new window —
        fixed-step runs carry their remaining round budget across the
        switch."""
        while True:
            run = self.start_fused(gamma, num_steps, reserve_steps)
            if run is None:
                return
            regamma = None
            while True:
                t_chunk = time.perf_counter()
                done = self.step_fused(run)
                finished = self.probe_fused(run)
                r_chunk = int(run.get("last_rounds", 0))
                if r_chunk > 0:
                    self._note_round_time(
                        run["gamma"], len(run["seqs"]),
                        (time.perf_counter() - t_chunk) / r_chunk,
                    )
                if done or finished:
                    break
                # force_gamma (bench neighbor-ladder calibration) pins the
                # window: re-adapting mid-run would record few or no
                # post-compile samples at the forced gamma (advisor r4)
                if self.pcfg.gamma == -1 and self.force_gamma is None:
                    g2 = self._adapt_gamma(gamma)
                    if g2 != gamma:
                        regamma = g2
                        break
            self.end_fused(run)
            if regamma is not None:
                gamma = regamma
                self.last_gamma = gamma
                if num_steps is not None:
                    num_steps = max(int(run["remaining"]), 0)
                    if num_steps == 0:
                        return
                continue
            if not run["stalled"]:
                return

    def _fused_ar_run(self):
        sch = self.scheduler
        while True:
            if not sch.running:
                return
            gamma1_chunk = min(
                self._fused_chunk_rounds(0, len(sch.running)) * 8,
                self.pcfg.max_dispatch_steps,
            )
            cap_fn = lambda s: (
                min(s.max_tokens - s.num_completion_tokens, gamma1_chunk) + 2
            )
            seqs = sch.schedule_decode(lookahead=cap_fn, ar_only=True, strict=False)
            if not seqs:
                return
            state = self._build_fused_state(seqs, ar_only=True)
            remaining = max(s.max_tokens - s.num_completion_tokens for s in seqs) + 1
            stalled = False
            first = True
            while remaining > 0:
                chunk = min(remaining, gamma1_chunk)
                if not first:
                    # grow reservations for the next chunk from device state
                    fetched = jax.device_get({
                        "finished": state["finished"], "length": state["length"],
                    })
                    if fetched["finished"].all():
                        break
                    ok = True
                    grow = []
                    for i, s in enumerate(seqs):
                        if fetched["finished"][i]:
                            continue
                        extra = int(fetched["length"][i]) - len(s.target.token_ids) + min(
                            s.max_tokens - (int(fetched["length"][i]) - s.num_prompt_tokens),
                            gamma1_chunk,
                        ) + 2
                        grow.append((s, max(0, extra)))
                    for s, extra in grow:
                        if not sch.target_bm.can_ensure(s.target, extra):
                            ok = False
                            break
                    if not ok:
                        stalled = True
                        break
                    for s, extra in grow:
                        sch.target_bm.ensure_capacity(s.target, extra)
                    b_pad = state["length"].shape[0]
                    views = [s.target for s in seqs]
                    m = next_pow2(max(8, max(len(v.block_table) for v in views)))
                    bt = np.full((b_pad, m), self.target.garbage_block, np.int32)
                    for i, v in enumerate(views):
                        bt[i, : len(v.block_table)] = v.block_table
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    state["bt_t"] = jax.device_put(
                        bt, NamedSharding(self.target.gmesh.mesh, P())
                    )
                state = self._fused_impl.run_ar(state, chunk, self._next_seed() * 100003)
                remaining -= chunk
                first = False
            self._fused_sync(seqs, state, ar_only=True)
            if not stalled:
                return

    def _fused_sync(self, seqs, state, ar_only: bool = False):
        """Pull the device state machine back into host Sequence objects."""
        sch = self.scheduler
        keys = ["tokens", "length", "finished"]
        if not ar_only:
            keys += ["pre", "cur_acc", "emitted", "emit_cnt"]
        # one pipelined D2H for all arrays: sequential np.asarray pays a
        # full tunnel round-trip per array (~30 ms each)
        fetched = jax.device_get({k: state[k] for k in keys})
        tokens, length, finished = (
            fetched["tokens"], fetched["length"], fetched["finished"],
        )
        if not ar_only:
            pre = fetched["pre"]
            cur_acc = fetched["cur_acc"]
            emitted = fetched["emitted"].astype(np.float64)
            emit_cnt = fetched["emit_cnt"]
        for i, seq in enumerate(seqs):
            stream = tokens[i, : int(length[i])].tolist()
            seq.target.token_ids = stream
            if not ar_only:
                seq.draft.token_ids = list(stream)
                seq.pre_verify = bool(pre[i])
                seq.cur_acc_tokens = int(cur_acc[i])
                tot, cnt = float(emitted[i]), int(emit_cnt[i])
                if cnt:
                    # per-emit values are not materialized on device; a
                    # flat split preserves sum and count (=> exact MAT)
                    seq.num_acc_tokens.extend([tot / cnt] * cnt)
            if finished[i]:
                sch.finish(seq)

    # ------------------------------------------------------------- serving

    def serve_round(self, fused_rounds: int = 8) -> None:
        """One continuous-batching iteration: admit whatever prefills fit,
        then advance the running batch by one PEARL round (overlap mode)
        or a short fused chunk. New sequences join mid-flight in
        pre-verify state — the verify state machine needs no special
        casing for them. This is the capability the reference lists as
        TODO (reference: README.md:110 'continuous batching')."""
        if self.scheduler.waiting:
            self.prefill_all(strict=False)
        if not self.scheduler.running:
            return
        gamma = self._pick_gamma()
        self.last_gamma = gamma
        if self.fused is not None:
            self._fused_pearl_run(gamma, num_steps=fused_rounds)
        else:
            self.pearl_round(gamma)

    # --------------------------------------------------------- auto gamma

    def auto_set_gamma(self, profile_steps: int = 12, skip_first: int = 3,
                       batch_sizes=(1, 2, 4, 8, 16, 32), seq_len: int = 256):
        """Profile draft vs target decode speed and set gamma per batch
        size (reference: auto_set_gamma, :346-387)."""
        from nano_pearl_tpu.config import SamplingParams

        gamma_list = {}
        for bs in batch_sizes:
            if bs > self.pcfg.max_num_seqs:
                break
            seqs = [
                Sequence([1] * seq_len, SamplingParams(temperature=0.0),
                         self.pcfg.kvcache_block_size)
                for _ in range(bs)
            ]
            for s in seqs:
                self.scheduler.add(s)
            admitted = self.scheduler.schedule_prefill()
            if len(admitted) < bs:
                self.scheduler.clear()
                break
            speeds = {}
            for runner, views in (
                (self.draft, [s.draft for s in seqs]),
                (self.target, [s.target for s in seqs]),
            ):
                bm = self.scheduler.draft_bm if runner is self.draft else self.scheduler.target_bm
                times = []
                for step in range(profile_steps):
                    for v in views:
                        bm.ensure_capacity(v, 1)
                    if runner.is_local:
                        t0 = time.perf_counter()
                        logits = runner.decode(views, self.pcfg.bucket_batch(bs), self._m_pad(views))
                        toks = np.asarray(jax.block_until_ready(logits)).argmax(-1)
                        times.append(time.perf_counter() - t0)
                    else:
                        # disjoint multi-host non-owner: track lengths only
                        # (profile state is discarded; the owner's measured
                        # speed is broadcast below)
                        toks = np.zeros((bs,), np.int32)
                    for v, t in zip(views, toks[:bs]):
                        v.append(int(t))
                good = times[skip_first:]
                speeds[runner.name] = len(good) / sum(good) if good else 0.0
            speeds["draft"] = float(self._from_draft(np.float64(speeds["draft"])))
            speeds["target"] = float(self._from_target(np.float64(speeds["target"])))
            self._speeds[bs] = (speeds["draft"], speeds["target"])
            gamma_list[bs] = max(1, round(speeds["draft"] / speeds["target"]))
            logger.info(
                f"auto-gamma bs={bs}: draft {speeds['draft']:.1f} it/s, "
                f"target {speeds['target']:.1f} it/s -> gamma {gamma_list[bs]}"
            )
            self.scheduler.clear()
        self.gamma_list = gamma_list or {1: 4}
