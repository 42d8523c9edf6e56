"""Device mesh construction + data-parallel sharding for train steps.

The reference had **no distributed training** (single GPU tf.Session; the
per-device placeholder lists in ``models/ctc/ctc.py`` were unused tower
plumbing — SURVEY.md §2.10). Here data parallelism is first-class and
TPU-native: a 1-D ``data`` mesh, batches sharded along it, parameters and
optimizer state replicated, and the gradient all-reduce emerges as an XLA
``psum`` over ICI when jit partitions the donated train step. No NCCL/MPI
analogue exists or is needed — collectives ride the compiler.

The same helpers serve the virtual 8-device CPU mesh used in tests and the
driver's ``dryrun_multichip`` validation (multi-chip hardware is not
available in this environment).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(f"requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put a host batch with the leading axis sharded over the mesh."""
    spec = batch_sharding(mesh)
    return {k: jax.device_put(v, spec) for k, v in batch.items()}


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def setup_data_parallel(mesh: Mesh, params, opt_state, batch=None):
    """Place training state for DP under ``mesh``: params/opt_state replicated,
    batch sharded on its leading axis. With inputs placed this way, calling
    the ordinary jitted train step partitions the computation over the mesh
    (computation follows data) and the gradient all-reduce lowers to a psum
    over ICI — no step-function changes needed.
    """
    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)
    if batch is not None:
        batch = shard_batch(mesh, batch)
    return params, opt_state, batch
