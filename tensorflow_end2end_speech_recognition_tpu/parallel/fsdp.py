"""Fully-sharded data parallelism (ZeRO-3) over the ``data`` mesh axis.

The sixth leg of the TPU-native scale-out plan (dp ``mesh.py``, tp
``tp.py``, pp ``pp.py``, sp ``sp.py``, ep ``ep.py``): instead of
replicating parameters and optimizer moments on every data-parallel chip,
shard EVERY tensor of the training state across the same ``data`` axis the
batch rides — each chip holds 1/N of the parameters and 1/N of the
optimizer state at rest. Per-use, XLA's SPMD partitioner inserts the
weight all-gather in the forward (and its transpose in the backward), so
compute is unchanged while at-rest memory drops by the mesh size. This is
the memory-side counterpart of plain DP: same batch semantics, same
numerics (tests assert bit-parity), different residency.

Expressed the GSPMD way: placement only. Each parameter leaf is sharded on
its LARGEST axis divisible by the mesh size (balanced bytes/chip; tiny or
indivisible leaves replicate — they are noise at rest), optimizer moments
follow their parameters (``tp.opt_state_shardings``), and jit's
propagation does the rest: the compiled step contains the weight
all-gathers and the gradient reduction, and the donated updated state
keeps its sharded placement (asserted in tests — no per-step resharding).

On this toolchain the partitioner realizes the gradient path as all-reduce
+ dynamic-slice rather than a fused reduce-scatter; correct and
memory-equivalent at rest, marginally more ICI bytes in backward. Noted in
BASELINE.md; re-probe when the toolchain updates.

Because ZeRO-3 is placement-only it COMPOSES with the other placement-only
axes on a 2-D mesh: ``fsdp: true`` + ``num_model_shards`` shards each
Megatron-parallel weight's remaining free axis over ``data`` (2-D weight
sharding, the standard ZeRO+Megatron production recipe); + ``num_sequence_
shards``/``num_expert_shards`` analogously. Pipeline parallelism is the
exception — its stage weights live inside ``shard_map`` where GSPMD
propagation does not reach, so fsdp+pp is rejected in ``fit()``.

Reference parity note: the reference is single-device (SURVEY.md §2.10);
this module is part of the rebuild's pod-scale extension.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .tp import opt_state_shardings

DATA_AXIS = "data"


def fsdp_spec_for(leaf, num_shards: int, axis_name: str = DATA_AXIS,
                  base: P | None = None) -> P:
    """Shard the largest axis divisible by ``num_shards``; replicate if none.

    Largest-axis (not axis-0) keeps bytes/chip balanced for the projection
    matrices whose first axis is an input dim ([D_in, 4H] LSTM weights,
    [d, ff] FFs) while still sharding biases/vectors when divisible.

    ``base`` composes ZeRO-3 with another placement-only sharding axis
    (tp's Megatron specs, ep's stacked expert banks): the ``data`` axis
    fills the largest still-FREE axis of the base spec, yielding 2-D weight
    sharding — e.g. a column-parallel ``[d, 4d]`` FF at ``P(None, "model")``
    becomes ``P("data", "model")``. Axes the base already names are never
    touched; if no free axis divides, the base spec is returned unchanged.
    """
    shape = np.shape(leaf)
    entries = list(base) if base is not None else []
    entries += [None] * (len(shape) - len(entries))
    best = -1
    best_size = 0
    for i, s in enumerate(shape):
        if entries[i] is None and s % num_shards == 0 and s >= num_shards \
                and s > best_size:
            best, best_size = i, s
    if best < 0:
        return base if base is not None else P()
    entries[best] = axis_name
    while entries and entries[-1] is None:  # P('data', None) != P('data')
        entries.pop()
    return P(*entries)


def fsdp_partition_specs(params, num_shards: int, base_specs=None):
    """Tree of ``PartitionSpec``s matching ``params``' structure.

    With ``base_specs`` (a same-structure tree of specs from another
    placement-only axis — tp/ep), the ``data`` axis composes into each
    leaf's largest free axis instead of starting from replication.
    """
    if base_specs is None:
        return jax.tree.map(lambda leaf: fsdp_spec_for(leaf, num_shards), params)
    return jax.tree.map(
        lambda b, leaf: fsdp_spec_for(leaf, num_shards, base=b),
        base_specs, params, is_leaf=lambda x: isinstance(x, P),
    )


def setup_fsdp(mesh: Mesh, params, opt_state=None, batch=None, base_specs=None):
    """Place training state fully sharded over the mesh's ``data`` axis.

    Params and optimizer moments shard per ``fsdp_partition_specs``;
    batches shard on their leading axis exactly as plain DP. The ordinary
    jitted train step then runs FSDP: weight all-gathers in forward,
    transposed reductions in backward, updated state staying sharded
    through donation.

    ``mesh`` may be 1-D (plain ZeRO-3) or 2-D (composed with tp/sp/ep —
    pass the companion axis's param specs as ``base_specs``; sp replicates
    weights so its base is None and only the mesh differs). Sharding degree
    is the ``data`` axis extent, not the device count.
    """
    from .mesh import shard_batch

    n = mesh.shape[DATA_AXIS]
    specs = fsdp_partition_specs(params, n, base_specs)
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
