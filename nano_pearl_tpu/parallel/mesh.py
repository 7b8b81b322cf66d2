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
SP_AXIS = "sp"
PP_AXIS = "pp"
EP_AXIS = "ep"


@dataclass
class GroupMesh:
    """A model group's mesh plus convenience shardings."""

    name: str
    mesh: Mesh

    @property
    def tp_size(self) -> int:
        return self.mesh.shape[TP_AXIS]

    @property
    def sp_size(self) -> int:
        return self.mesh.shape.get(SP_AXIS, 1)

    @property
    def pp_size(self) -> int:
        return self.mesh.shape.get(PP_AXIS, 1)

    @property
    def ep_size(self) -> int:
        return self.mesh.shape.get(EP_AXIS, 1)

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def _group_mesh(name: str, devs: list, sp: int, pp: int = 1, ep: int = 1) -> GroupMesh:
    """1-axis ("tp",) mesh when sp == pp == ep == 1 (keeps compiled-
    program caches stable for the common case). A single extra axis goes
    OUTER (("sp"|"pp"|"ep", "tp")) so each tp group stays on ICI-adjacent
    devices. pp and sp COMPOSE (round-4): a ("pp", "sp", "tp") mesh
    shards layers over stages AND cache blocks within each stage —
    attention runs the sp partial-softmax merge nested inside the pp
    body (parallel/sp.py nested wrappers). ep stays exclusive (MoE
    expert sharding does not yet compose with pp/sp)."""
    assert ep == 1 or (sp == 1 and pp == 1), (
        "ep does not compose with sp/pp"
    )
    if sp == pp == ep == 1:
        return GroupMesh(name, Mesh(np.array(devs), (TP_AXIS,)))
    if pp > 1 and sp > 1:
        tp = len(devs) // (pp * sp)
        return GroupMesh(
            name,
            Mesh(np.array(devs).reshape(pp, sp, tp), (PP_AXIS, SP_AXIS, TP_AXIS)),
        )
    outer_n, outer_ax = max(
        ((sp, SP_AXIS), (pp, PP_AXIS), (ep, EP_AXIS)), key=lambda t: t[0]
    )
    tp = len(devs) // outer_n
    return GroupMesh(
        name, Mesh(np.array(devs).reshape(outer_n, tp), (outer_ax, TP_AXIS))
    )


def build_group_meshes(
    draft_tp: int,
    target_tp: int,
    devices: list | None = None,
    placement: str = "disjoint",
    draft_sp: int = 1,
    target_sp: int = 1,
    draft_pp: int = 1,
    target_pp: int = 1,
    draft_ep: int = 1,
    target_ep: int = 1,
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

    ``draft_sp``/``target_sp`` add a sequence-parallel (context-parallel)
    mesh axis: a group spans tp*sp devices, its KV cache is sharded over
    blocks on the sp axis, and attention merges per-shard partial
    softmaxes (parallel/sp.py) — max_model_len memory and attention
    compute scale with sp. New capability beyond the reference (SURVEY
    §2.8: sequence/context parallel absent there).

    ``draft_pp``/``target_pp`` add a pipeline-parallel axis instead:
    layer weights and cache shard over stages (parallel/pp.py).
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    n = len(devices)
    d_n = draft_tp * draft_sp * draft_pp * draft_ep
    t_n = target_tp * target_sp * target_pp * target_ep
    if placement == "union":
        assert (
            draft_sp == target_sp and draft_pp == target_pp and draft_ep == target_ep
        ), "union placement needs equal sp/pp/ep"
        assert draft_tp == target_tp and d_n == n, (
            f"union placement needs draft_tp == target_tp == num_devices/sp "
            f"({draft_tp}, {target_tp}, {n}/{draft_sp})"
        )
        draft_devs = target_devs = devices
    elif n >= d_n + t_n:
        draft_devs = devices[:d_n]
        target_devs = devices[d_n : d_n + t_n]
    else:
        logger.warning(
            f"only {n} device(s) for draft {d_n} + target {t_n}; "
            "groups will share devices (no cross-group overlap)."
        )
        draft_devs = [devices[i % n] for i in range(d_n)]
        target_devs = [devices[(i + d_n) % n] for i in range(t_n)]

    draft = _group_mesh("draft", draft_devs, draft_sp, draft_pp, draft_ep)
    target = _group_mesh("target", target_devs, target_sp, target_pp, target_ep)
    return draft, target
