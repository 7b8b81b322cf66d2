"""TRUE multi-process (multi-controller) execution.

The reference is explicitly single-host (<= 8 GPUs asserted,
reference: pearl_config.py:103); multi-host is a north-star capability.
This test runs the engine across TWO separate Python processes (each
"host" owning 4 virtual CPU devices) joined by jax.distributed into one
8-device global mesh — the real multi-controller code path, not an
emulation: cross-process Gloo collectives inside the fused PEARL
program, replicated fetches on every controller, deterministic-replay
host loops (parallel/distributed.py).
"""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(mode: str):
    port = _free_port()
    num = 2
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(i), str(num), str(port), mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=env,
        )
        for i in range(num)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MHRESULT "):
                r = json.loads(line[len("MHRESULT "):])
                results[r["pid"]] = r["tokens"]
    assert set(results) == {0, 1}, f"missing results: {outs}"
    # every controller must replay to the identical committed streams
    assert results[0] == results[1]
    # ignore_eos + max_tokens=12; PEARL may overshoot by <= gamma on an
    # accept-finish (documented deviation #4, same as the reference)
    assert all(len(t) >= 12 for t in results[0])


def test_two_process_engine_agrees():
    """Union placement: both models TP-shard the global 8-device mesh,
    the PEARL loop is one fused SPMD program over DCN collectives."""
    _run_workers("union")


def test_two_process_disjoint_groups():
    """Disjoint placement ACROSS HOSTS: the draft model lives entirely on
    process 0's devices and the target on process 1's (the reference's
    disjoint NCCL group topology, pearl_config.py:88-93, at host
    granularity). Each controller dispatches only its own group; draft
    tokens and verdict vectors cross via host-level broadcast; PEARL ==
    AR at T=0 must hold and both controllers must replay identically."""
    _run_workers("disjoint")
