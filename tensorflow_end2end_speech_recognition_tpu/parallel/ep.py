"""Expert parallelism over an ``expert`` mesh axis.

The fifth mesh axis of the TPU-native scale-out plan (data ``mesh.py``,
model ``tp.py``, pipe ``pp.py``, seq ``sp.py``): Mixture-of-Experts
feed-forwards (``models/conformer.py`` ``moe_experts > 1``) keep their
expert bank STACKED on a leading E axis — router [d, E], in.w [E, d, ff],
out.w [E, ff, d] — and that axis shards over ``expert``. Each chip holds
E/S experts plus their optimizer moments; everything else (attention, conv
modules, router, heads, non-MoE encoders) replicates.

Expressed the GSPMD way: placement only, no hand-written collectives. The
MoE forward is the dense-evaluation dispatch (every expert over every
token, gates sparse — ``models/conformer._moe_ff``), so sharding the
stacked weights makes each chip compute ONLY its local experts over all
tokens; the combine einsum contracts the expert axis and XLA inserts the
cross-expert reduce (+ the transposed collectives in backward). At
ep = E the per-chip FF FLOPs equal the dense model's with E x the
parameters — the MoE scaling recipe.

Reference parity note: the reference is single-device with dense FFs only
(SURVEY.md §2.10); this module is part of the rebuild's pod-scale
extension, same tier as ``tp.py``/``pp.py``/``sp.py``.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .tp import _path_keys, opt_state_shardings

EXPERT_AXIS = "expert"
DATA_AXIS = "data"


@functools.lru_cache(maxsize=None)
def make_mesh_dp_ep(num_data: int, num_expert: int) -> Mesh:
    """A ``(data, expert)`` mesh over the first ``num_data*num_expert``
    devices (cached: one Mesh object per shape, like the tp/pp/sp builders)."""
    devices = jax.devices()
    n = num_data * num_expert
    if n > len(devices):
        raise ValueError(
            f"requested {num_data}x{num_expert}={n} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:n]).reshape(num_data, num_expert)
    return Mesh(arr, (DATA_AXIS, EXPERT_AXIS))


def _spec_for(path_keys: list[str], leaf) -> P:
    """Partition spec for one parameter leaf: stacked expert weights shard
    on their leading E axis; the router and everything else replicate."""
    if "moe" in path_keys:
        parent = path_keys[-2] if len(path_keys) >= 2 else ""
        if parent in ("in", "out") and np.ndim(leaf) >= 2:
            return P(EXPERT_AXIS)  # leading E axis; rest replicated
    return P()


def expert_partition_specs(params):
    """Tree of ``PartitionSpec``s matching ``params``' structure."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(_path_keys(path), leaf), params
    )


def setup_expert_parallel(mesh: Mesh, params, opt_state=None, batch=None):
    """Place training state for dp x ep under a ``(data, expert)`` mesh.

    Expert banks shard on their leading E axis; optimizer moments follow
    their parameters (``tp.opt_state_shardings`` suffix matching); batches
    shard over ``data`` only. The gradient all-reduce over ``data`` and the
    expert-combine reduce over ``expert`` are both XLA-inserted.
    """
    from .mesh import shard_batch

    specs = expert_partition_specs(params)
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    params = jax.device_put(params, shardings)
    if opt_state is not None:
        opt_state = jax.device_put(
            opt_state, opt_state_shardings(opt_state, specs, mesh)
        )
    if batch is not None:
        batch = shard_batch(mesh, batch)
    return params, opt_state, batch
