"""Data-parallel serving: N full PEARL replicas, one controller.

A capability beyond the reference (SURVEY §2.8 lists data parallelism as
absent there): each replica is a complete draft+target PEARL engine on
its own disjoint device slice, and one host process routes requests and
interleaves the replicas' fused-loop chunk dispatches. Because JAX
dispatch is asynchronous, chunk k of replica 0 executes on its devices
while the host is dispatching chunk k of replica 1 — the identical
overlap mechanism PEARL itself uses for the draft||target groups, lifted
one level up. No collectives cross replicas; scaling is embarrassingly
parallel (throughput ~ dp for saturating workloads).

Routing is least-loaded by queued+running sequences at submit time.
Sequence ids are process-global (engine/sequence.py), so results from
all replicas merge unambiguously.
"""

from __future__ import annotations

import time
from dataclasses import replace

from nano_pearl_tpu.config import PearlConfig, SamplingParams
from nano_pearl_tpu.engine.engine import PearlEngine
from nano_pearl_tpu.utils.logging import logger


class DataParallelEngine:
    def __init__(
        self,
        config: PearlConfig,
        dp: int,
        *,
        draft_params: dict | None = None,
        target_params: dict | None = None,
    ):
        import jax

        assert dp >= 1
        devices = list(config.devices) if config.devices is not None else jax.devices()
        if config.placement == "union":
            per = config.draft_tp
        else:
            per = config.draft_tp + config.target_tp
        if len(devices) < dp * per:
            logger.warning(
                f"{len(devices)} device(s) for dp={dp} x {per}; replicas will "
                "share devices (correctness only, no scaling)."
            )
            slices = [
                [devices[(r * per + i) % len(devices)] for i in range(per)]
                for r in range(dp)
            ]
        else:
            slices = [devices[r * per : (r + 1) * per] for r in range(dp)]
        self.replicas = [
            PearlEngine(
                replace(config, devices=slices[r], seed=config.seed + r),
                draft_params=draft_params,
                target_params=target_params,
            )
            for r in range(dp)
        ]
        self.config = config
        self.dp = dp

    # ------------------------------------------------------------- routing

    def _least_loaded(self) -> PearlEngine:
        def load(r: PearlEngine):
            return len(r.scheduler.waiting) + len(r.scheduler.running)

        return min(self.replicas, key=load)

    def add_request(self, prompt, sampling_params: SamplingParams | None = None) -> int:
        return self._least_loaded().add_request(prompt, sampling_params)

    submit = add_request

    # ----------------------------------------------------------- generation

    def generate_token_ids(self):
        """PEARL generation across all replicas; returns the merged
        (token_ids, num_tokens, num_acc, elapsed) ordered by seq_id —
        the same contract as PearlEngine.generate_token_ids."""
        start = time.perf_counter()
        # phase 1: prefill + first chunk dispatch per replica (their fused
        # programs start executing concurrently on disjoint devices)
        engines = []
        final: dict[int, object] = {}  # id(eng) -> current run handle
        active = []
        for eng in self.replicas:
            if eng.scheduler.is_finished():
                continue
            orch = eng.orchestrator
            orch.prefill_all()
            engines.append(eng)
            if orch.fused is None:
                # non-fused replica (disjoint sub-meshes inside the
                # replica): run it to completion on its own
                while not eng.scheduler.is_finished():
                    orch.pearl_round(orch._pick_gamma())
                final[id(eng)] = None
                continue
            gamma = orch._pick_gamma() if eng.scheduler.running else 1
            run = orch.start_fused(gamma)
            final[id(eng)] = run
            if run is not None and not orch.step_fused(run):
                active.append(eng)

        # phase 2: round-robin chunk dispatches until every replica's rows
        # finish; each probe only waits on that replica's own stream. A
        # run stalled on KV pressure is synced back and restarted (its
        # rescheduling preempts to make room — see pearl.start_fused).
        while active:
            nxt = []
            for eng in active:
                orch = eng.orchestrator
                run = final[id(eng)]
                if orch.probe_fused(run):
                    continue
                done = orch.step_fused(run)
                if not done:
                    nxt.append(eng)
                    continue
                if run["stalled"]:
                    orch.end_fused(run)
                    run = orch.start_fused(run["gamma"])
                    final[id(eng)] = run
                    if run is not None and not orch.step_fused(run):
                        nxt.append(eng)
            active = nxt

        # phase 3: sync every replica's state back to its sequences
        results = []
        for eng in engines:
            run = final[id(eng)]
            if run is not None:
                eng.orchestrator.end_fused(run)
            finished = eng.scheduler.finished
            _, num_tokens, num_acc, token_ids = eng._collect(finished)
            results.extend(
                (s.seq_id, t, n, a)
                for s, t, n, a in zip(finished, token_ids, num_tokens, num_acc)
            )
            eng.scheduler.clear()
        results.sort(key=lambda x: x[0])
        elapsed = time.perf_counter() - start
        return (
            [r[1] for r in results],
            [r[2] for r in results],
            [r[3] for r in results],
            elapsed,
        )

    # ------------------------------------------------- continuous serving

    def serve_step(self, fused_rounds: int = 8):
        """One continuous-batching iteration per replica; returns all
        newly finished (seq_id, completion_token_ids, num_acc_tokens)."""
        done = []
        for eng in self.replicas:
            done.extend(eng.serve_step(fused_rounds))
        return done

    @property
    def has_work(self) -> bool:
        return any(eng.has_work for eng in self.replicas)

    def exit(self):
        for eng in self.replicas:
            eng.exit()
