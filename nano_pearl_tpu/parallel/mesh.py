"""Device meshes for the draft and target model groups.

TPU-native replacement for the reference's NCCL process groups
(reference: pearl_model_runner.py:51-79). The reference spawns one
process per GPU and builds draft/target/verify NCCL groups; here a
single controller owns all devices and each model group gets its own
``jax.sharding.Mesh`` over a disjoint slice of them. Tensor-parallel
collectives become GSPMD-inserted ICI all-reduces inside each group's
compiled program; the draft<->target "verify group" broadcast becomes a
small host round-trip (tokens are O(batch*gamma) int32 — negligible) or
a direct device-to-device transfer.

Concurrency model: the two groups' programs are dispatched back-to-back
from the single controller; since JAX dispatch is asynchronous and the
meshes are disjoint, the draft's gamma-step scan and the target's packed
verify forward execute concurrently on the hardware — the same overlap
the reference obtains from separate processes.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nano_pearl_tpu.utils.logging import logger

TP_AXIS = "tp"


@dataclass
class GroupMesh:
    """A model group's mesh plus convenience shardings."""

    name: str
    mesh: Mesh

    @property
    def tp_size(self) -> int:
        return self.mesh.shape[TP_AXIS]

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def build_group_meshes(
    draft_tp: int,
    target_tp: int,
    devices: list | None = None,
    placement: str = "disjoint",
) -> tuple[GroupMesh, GroupMesh]:
    """Build the draft and target sub-meshes.

    placement="disjoint" (reference semantics, pearl_config.py:88-93:
    draft gets ranks 0..dtp-1, target the next ttp): the two groups can
    overlap their programs in time but each model only spans its own
    chips. When there are not enough devices (e.g. a single test chip)
    the groups share devices round-robin — identical numerics, no
    overlap.

    placement="union": BOTH groups are TP-sharded over the SAME device
    list (requires draft_tp == target_tp == len(devices)). No cross-group
    overlap, but each model gets the full ICI width and the fused
    zero-sync loop (engine/fused.py) works multi-chip. Which placement
    wins is model/hardware dependent — benchmark both.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    n = len(devices)
    if placement == "union":
        assert draft_tp == target_tp == n, (
            f"union placement needs draft_tp == target_tp == num_devices "
            f"({draft_tp}, {target_tp}, {n})"
        )
        draft_devs = target_devs = devices
    elif n >= draft_tp + target_tp:
        draft_devs = devices[:draft_tp]
        target_devs = devices[draft_tp : draft_tp + target_tp]
    else:
        logger.warning(
            f"only {n} device(s) for draft_tp={draft_tp} + target_tp={target_tp}; "
            "groups will share devices (no cross-group overlap)."
        )
        draft_devs = [devices[i % n] for i in range(draft_tp)]
        target_devs = [devices[(i + draft_tp) % n] for i in range(target_tp)]

    draft = GroupMesh("draft", Mesh(np.array(draft_devs), (TP_AXIS,)))
    target = GroupMesh("target", Mesh(np.array(target_devs), (TP_AXIS,)))
    return draft, target
