"""Multi-host (pod-scale) data loading: per-process shards, DCN-free.

The reference is one process on one device (SURVEY.md §2.10); its rebuild
scales data parallelism over an ICI mesh (``mesh.py``). At pod scale JAX
runs one process per host and each process addresses only its local chips;
the rule for the data path (SURVEY.md §5.8) is that feature bytes must ride
host-local IO and ICI only — DCN carries nothing but XLA collectives.

Design — lockstep by construction:

- Every process builds the IDENTICAL batch schedule: the ``Dataset``
  order is a pure function of (utterance inventory, seed, epoch), so no
  cross-host coordination, no length negotiation, no DCN metadata traffic.
- Each process materializes only its OWN row slice of every global batch —
  rows ``[p·B/P, (p+1)·B/P)`` for process p of P — so per-host load/pad
  cost is 1/P and a host never touches another host's feature files.
- ``global_device_batch`` lifts the local rows into a global ``jax.Array``
  sharded over the DP mesh via ``jax.make_array_from_process_local_data``;
  the ordinary jitted train step then runs unchanged (computation follows
  data) and the gradient all-reduce lowers to psum over ICI (and DCN only
  between pod slices, where XLA routes it automatically).

Single-process meshes (this environment: one real chip, or the 8-virtual-
device CPU test mesh) take the same code path: the process slice is the
whole batch and ``make_array_from_process_local_data`` degenerates to a
plain sharded device_put.
"""

from __future__ import annotations

import jax

from .mesh import batch_sharding


def process_slice(batch: dict, process_index: int | None = None,
                  process_count: int | None = None) -> dict:
    """This process's rows of a global host batch.

    ``batch`` maps names to arrays with a common leading (batch) axis
    (entries without that axis length — e.g. the host-side ``names`` list —
    are sliced the same way, which keeps eval bookkeeping per-host too).
    The global batch size must divide evenly: the ``Dataset`` always emits
    full-size batches (short final batches are padded with duplicate rows,
    deduplicated downstream by name), so this only rejects misconfigured
    batch_size/process_count combinations.
    """
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    if n == 1:
        return batch
    sizes = {len(v) for v in batch.values()}
    if len(sizes) != 1:
        raise ValueError(f"inconsistent leading axis across batch entries: {sizes}")
    (b,) = sizes
    if b % n:
        raise ValueError(f"global batch size {b} not divisible by {n} processes")
    k = b // n
    return {key: v[p * k : (p + 1) * k] for key, v in batch.items()}


def global_device_batch(mesh, local_batch: dict, process_count: int | None = None) -> dict:
    """Assemble the global batch-sharded jax.Arrays from process-local rows.

    ``local_batch`` holds this process's rows only (``process_slice``); the
    returned arrays have the full global leading axis, sharded over the
    mesh's data axis. No feature bytes cross DCN — each host feeds exactly
    the shards its own devices hold.
    """
    n = jax.process_count() if process_count is None else process_count
    spec = batch_sharding(mesh)
    if n == 1:
        # single process owns every device: plain sharded transfer
        # (same placement as parallel/mesh.py's shard_batch)
        return {k: jax.device_put(v, spec) for k, v in local_batch.items()}
    # multi-process: every process must contribute addressable devices to
    # the mesh, or make_array_from_process_local_data fails deep inside JAX
    # (a mesh built from a prefix of jax.devices() covers host 0 only)
    procs = {d.process_index for d in mesh.devices.flat}
    if jax.process_index() not in procs or len(procs) != n:
        raise ValueError(
            f"mesh devices span processes {sorted(procs)} but there are {n} "
            f"processes (this is process {jax.process_index()}): multi-host "
            f"training needs a mesh over ALL processes' devices — build it "
            f"from jax.devices() with num_devices = total chip count"
        )
    return {
        k: jax.make_array_from_process_local_data(spec, v)
        for k, v in local_batch.items()
    }


def distribute_batch(mesh, batch: dict) -> dict:
    """process_slice + global_device_batch in one call (the fit() hook)."""
    return global_device_batch(mesh, process_slice(batch))


def local_replica(tree):
    """Process-local host-independent copy of a replicated param tree.

    Pod-scale eval (``utils.metrics.evaluate_ctc``) runs the decode step on
    each process's OWN row slice with plain local device placement; params
    trained under DP are fully replicated over the mesh, so every process
    already holds a complete copy — this just lifts the first addressable
    shard out of the global jax.Array so a process-local jit can consume it.
    Plain (non-distributed) arrays pass through unchanged.
    """

    import jax.numpy as jnp

    def one(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return jnp.asarray(x.addressable_shards[0].data)
        return x

    return jax.tree.map(one, tree)


def allreduce_counts(counts):
    """Sum a small numpy count vector across all processes (DCN, tiny).

    The pod-scale eval contract (SURVEY.md §2.10): each process scores only
    its own rows host-side (Levenshtein counts, loss sums, utterance
    counts), then the per-process count vectors — a few dozen bytes — are
    summed across hosts. Single-process is an identity no-op.
    """
    import numpy as np

    counts = np.asarray(counts)
    if jax.process_count() == 1:
        return counts
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(counts)).sum(axis=0)
