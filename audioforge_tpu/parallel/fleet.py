"""Calibration-fleet sharding: spread candidate sweeps over a device mesh.

The reference's Auto Voice Setup evaluates its 68-candidate compressor
search serially through the native simulator (`voice_setup.py:699-783`);
this framework batches the candidates into one device call
(:func:`audioforge_tpu.api.simulate_auto_eq_chain_batched`). At fleet
scale that batch axis shards over a ``jax.sharding.Mesh``: every candidate
is independent, so the computation is collective-free data parallelism —
XLA partitions the batched scan over devices and no cross-device traffic
occurs until results are fetched (SURVEY §2.9's "no algorithmic all-to-all
in this workload").

Recipe (see ``docs/multichip_fleet.md`` for the full walkthrough):

1. ``mesh = fleet_mesh()`` — one axis named ``"candidates"`` over all
   local devices (on a pod slice, over all addressable devices).
2. Pad the candidate list to a multiple of the device count
   (:func:`pad_candidates`) — XLA requires equal shards.
3. ``device_put`` every candidate-batched operand with a
   :class:`~jax.sharding.NamedSharding` placing the batch axis on
   ``"candidates"`` (:func:`shard_batched_tree` finds each leaf's batch
   axis by shape against an unbatched reference — the EQ cascade carries
   its batch axis mid-tensor).
4. Call the ordinary jitted batch function; GSPMD does the rest.

Validated on the virtual 8-device CPU mesh (tests/test_sharding.py and
``tools/evaluate_fleet_sharding.py``); on real hardware the same code runs
unchanged — only `fleet_mesh` sees more devices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "fleet_mesh",
    "pad_candidates",
    "batch_axis_of",
    "shard_batched_tree",
]

CANDIDATE_AXIS = "candidates"


def fleet_mesh(n_devices: int | None = None,
               axis_name: str = CANDIDATE_AXIS) -> Mesh:
    """A 1-D mesh over the first ``n_devices`` local devices (all by
    default). The single axis is the candidate/take batch axis — pure DP,
    no model sharding (SURVEY §2.9)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def pad_candidates(param_sets: list, n_devices: int) -> tuple[list, int]:
    """Pad a candidate list to a multiple of the device count by repeating
    the last candidate (equal shards per device). Returns
    ``(padded_list, original_count)``."""
    b = len(param_sets)
    if b == 0 or n_devices <= 1:
        return list(param_sets), b
    pad = (-b) % n_devices
    return list(param_sets) + [param_sets[-1]] * pad, b


def batch_axis_of(batched_shape, unbatched_shape) -> int | None:
    """Locate the inserted batch axis: the index whose removal turns
    ``batched_shape`` into ``unbatched_shape``. Returns None when the leaf
    is not batched (shared across candidates). When several indices
    qualify (equal-sized dims) the first is returned — any qualifying axis
    yields a valid, semantics-preserving sharding."""
    b, u = tuple(batched_shape), tuple(unbatched_shape)
    if len(b) != len(u) + 1:
        return None
    for i in range(len(b)):
        if b[:i] + b[i + 1:] == u:
            return i
    return None


def shard_batched_tree(tree, ref_tree, mesh: Mesh,
                       axis_name: str = CANDIDATE_AXIS):
    """``device_put`` a candidate-batched pytree with its batch axis sharded
    over ``mesh`` and every shared leaf replicated. ``ref_tree`` is the
    unbatched single-candidate counterpart used to locate each leaf's batch
    axis by shape."""
    replicated = NamedSharding(mesh, PartitionSpec())

    def put(leaf, ref):
        ax = batch_axis_of(np.shape(leaf), np.shape(ref))
        if ax is None:
            return jax.device_put(leaf, replicated)
        spec = PartitionSpec(*([None] * ax), axis_name)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree, ref_tree)
