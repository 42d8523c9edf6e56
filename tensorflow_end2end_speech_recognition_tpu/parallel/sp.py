"""Sequence (context) parallelism over a ``seq`` mesh axis.

The fourth mesh axis of the TPU-native scale-out plan (data ``mesh.py``,
model ``tp.py``, pipe ``pp.py``): the parallel-over-T encoders —
conformer/transformer, whose per-block math is independent across time
except for attention and the depthwise conv — shard their ACTIVATION time
axis across chips. Each chip holds ``T/S`` frames of every layer's
activations (and their saved residuals for the backward pass), so
utterances whose activation footprint exceeds one chip's HBM train and
evaluate across ICI neighbours. Weights replicate along ``seq`` — this
axis scales with sequence length, not parameter count (that is ``tp``'s
or ``pipe``'s job).

Expressed the GSPMD way: no hand-written collectives. The encoder applies
one ``with_sharding_constraint`` (activations ``P(data, seq, None)``) at
the stack entry and after every block; XLA's SPMD partitioner then keeps
the feed-forwards and norms fully local, inserts the all-gather attention
needs on its key/value side (queries stay sharded — scores [B, h, Tq_local,
T] never materialize globally), and exchanges one-frame halos for the
depthwise-conv shifts. The backward pass is the transposed program with
the mirrored collectives, derived by AD + partitioning, not by hand.

The depthwise conv must run ``depthwise_impl="shifts"`` under a sharded T
axis for the same reason as under ``tp``: the grouped-convolution gradient
is mispartitioned by the SPMD partitioner on 2-D meshes (zero kernel
grads, measured — BASELINE.md round 3); the shift-multiply-accumulate
form partitions exactly. ``utils/config.py`` routes this automatically.

Reference parity note: the reference is single-device (SURVEY.md §2.10);
this module is part of the rebuild's pod-scale extension, same tier as
``tp.py``/``pp.py``.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import shard_batch

SEQ_AXIS = "seq"
DATA_AXIS = "data"


@functools.lru_cache(maxsize=None)
def make_mesh_dp_sp(num_data: int, num_seq: int) -> Mesh:
    """A ``(data, seq)`` mesh over the first ``num_data*num_seq`` devices.

    Cached so the train loop and ``apply_encoder`` (tracing inside jit)
    build the SAME Mesh object. ``seq`` is minor: neighbouring T-shards
    land on ICI-adjacent chips, so attention gathers and conv halos ride
    one link.
    """
    import numpy as np

    devices = jax.devices()
    n = num_data * num_seq
    if n > len(devices):
        raise ValueError(
            f"requested {num_data}x{num_seq}={n} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:n]).reshape(num_data, num_seq)
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS))


def seq_shard_fn(mesh: Mesh, data_axis: str | None = DATA_AXIS,
                 seq_axis: str = SEQ_AXIS):
    """``shard_fn`` for ``apply_conformer``: constrain [B, T, D] activations
    to rows over ``data``, time over ``seq``, features replicated."""
    sh = NamedSharding(mesh, P(data_axis, seq_axis, None))

    def fn(x):
        return jax.lax.with_sharding_constraint(x, sh)

    return fn


def setup_sequence_parallel(mesh: Mesh, params, opt_state=None, batch=None):
    """Place training state for dp x sp under a ``(data, seq)`` mesh.

    Parameters (and optimizer moments) REPLICATE over the whole mesh —
    sequence parallelism shards activations, not weights; the gradient
    all-reduce over ``data`` and the partial-T gradient reductions over
    ``seq`` are both inserted by XLA. Batches shard over ``data`` only;
    the encoder's activation constraints reshard time on entry.
    """
    rep = NamedSharding(mesh, P())
    params = jax.device_put(params, rep)
    if opt_state is not None:
        opt_state = jax.device_put(opt_state, rep)
    if batch is not None:
        batch = shard_batch(mesh, batch)
    return params, opt_state, batch
