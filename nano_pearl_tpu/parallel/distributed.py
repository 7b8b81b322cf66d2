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

The VERIFIED multi-host mode is union placement + fused execution
(tests/test_multihost.py runs the engine across two real Python
processes joined by jax.distributed): both models TP-shard over the
global mesh, the whole PEARL loop is one SPMD program (cross-host
collectives ride DCN/Gloo), every host-visible output is fully
replicated so each controller fetches locally, and the deterministic
host loops stay coherent with zero control-plane communication.
Disjoint placement across hosts (draft devices on one host only) would
need per-process conditional dispatch and is not supported — use union.

Testing: the CPU suite emulates an 8-device host
(``--xla_force_host_platform_device_count``) and
tests/test_multihost.py exercises TRUE two-process multi-controller
execution (4+4 virtual devices, Gloo collectives). dryrun_multichip in
__graft_entry__ additionally validates every compiled program
SPMD-partitions over an 8-way mesh.
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
