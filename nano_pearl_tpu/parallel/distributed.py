"""Multi-host scaffolding.

The reference is explicitly single-host (<= 8 GPUs asserted,
reference: pearl_config.py:103, NCCL over tcp://localhost). The TPU
build targets pod slices: JAX's multi-controller model runs one Python
process per host, all executing the same program over one global device
set. What that means for this engine:

- ``initialize_multihost()`` must be called first on every host
  (wraps ``jax.distributed.initialize``; coordinator discovery is
  automatic on Cloud TPU).
- ``jax.devices()`` then returns the GLOBAL device list; build the
  engine identically on every host (same config, same requests, same
  seeds) — the host-side scheduler is deterministic, so every
  controller replays identical decisions, exactly the coherence model
  the reference uses across its worker processes
  (reference: SURVEY §1 "replaying the same deterministic decisions").
- sub-mesh placement should keep each model group inside an ICI domain;
  with placement="disjoint", pass an explicit ``devices`` list ordering
  draft chips first.
- small per-round fetches (draft tokens, verdicts) are replicated jit
  outputs; ``replicate_to_hosts`` guards fetching them when an output
  ends up device-sharded.

Two multi-host modes are VERIFIED (tests/test_multihost.py runs the
engine across real Python processes joined by jax.distributed):

- **union placement + fused execution**: both models TP-shard over the
  global mesh, the whole PEARL loop is one SPMD program (cross-host
  collectives ride DCN/Gloo), every host-visible output is fully
  replicated so each controller fetches locally, and the deterministic
  host loops stay coherent with zero control-plane communication.
- **disjoint placement across hosts** (overlap execution): the draft
  group lives entirely on one subset of hosts and the target group on
  another — the closest TPU analogue of the reference's disjoint NCCL
  process groups, and the mode where the two models overlap via true
  process concurrency. Each controller dispatches only the programs of
  the group(s) whose devices it owns (``mesh_is_local``); a runner with
  no local devices is built WITHOUT weights or KV cache
  (GroupRunner ``is_local=False``) and its per-round outputs (draft
  tokens, verdict vectors, sampled tokens — O(batch*gamma) int32)
  reach the other hosts through ``sync_from`` — a host-level DCN
  allgather playing the role of the reference's verify-group broadcast
  (reference: pearl_model_runner.py:523, :526, :662). The replicated
  host-side scheduler state then advances identically everywhere.

Testing: the CPU suite emulates an 8-device host
(``--xla_force_host_platform_device_count``) and
tests/test_multihost.py exercises TRUE two-process multi-controller
execution for both modes (4+4 virtual devices, Gloo collectives).
dryrun_multichip in __graft_entry__ additionally validates every
compiled program SPMD-partitions over an 8-way mesh.
"""

from __future__ import annotations

import jax

from nano_pearl_tpu.utils.logging import logger


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Initialize JAX's multi-controller runtime (call before any jax
    device use, on every host)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    logger.info(
        f"multihost initialized: process {jax.process_index()}/{jax.process_count()}, "
        f"{len(jax.local_devices())} local / {len(jax.devices())} global devices"
    )


def replicate_to_hosts(x):
    """Make a (possibly device-sharded) small array addressable on every
    host before np.asarray fetches."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return x
    return multihost_utils.process_allgather(x, tiled=False)


def is_multihost() -> bool:
    return jax.process_count() > 1


def mesh_is_local(mesh) -> bool:
    """True when this process owns at least one device of the mesh —
    i.e. this controller must dispatch (and is the only kind of
    controller that CAN dispatch) computations on it."""
    me = jax.process_index()
    return any(d.process_index == me for d in mesh.devices.flat)


def mesh_spans_all(mesh) -> bool:
    """True when every process owns part of the mesh (union placement):
    jit outputs replicated over it are locally addressable everywhere,
    so no host-level broadcast is needed."""
    procs = {d.process_index for d in mesh.devices.flat}
    return len(procs) == jax.process_count()


def owner_process(mesh) -> int:
    """The lowest-indexed process owning mesh devices — the designated
    source for host-level broadcasts of that group's outputs."""
    return min(d.process_index for d in mesh.devices.flat)


def sync_from(src: int, arr) -> "np.ndarray":
    """Return process ``src``'s host array on every process.

    The disjoint-placement analogue of the reference's cross-group
    broadcasts (verify tokens / verify_res on the global NCCL group,
    pearl_model_runner.py:523-526): a DCN-level allgather of a small
    host array, with everyone keeping the source row. Every process
    must call this at the same program point with the same shape/dtype
    (non-sources pass a zero placeholder). No-op single-process."""
    import numpy as np

    if jax.process_count() == 1:
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    out = multihost_utils.process_allgather(np.asarray(arr)[None], tiled=True)
    return np.asarray(out[src])
