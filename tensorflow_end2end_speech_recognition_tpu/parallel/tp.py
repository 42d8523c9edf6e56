"""Tensor (model) parallelism over a 2-D ``data x model`` mesh.

The reference trains on a single device (SURVEY.md §2.10); the rebuild's
data parallelism (``mesh.py``) replicates every weight. This module adds
the second mesh axis the TPU-native plan calls for: Megatron-style tensor
parallelism for the encoders whose FLOPs live in large dense matmuls — the
conformer/transformer blocks — expressed the GSPMD way. We never write a
collective by hand: parameters are *placed* with ``NamedSharding``s chosen
so that XLA's sharding propagation discovers the canonical column-parallel
-> row-parallel matmul pairing and inserts one ``all-reduce`` per block
output (over ICI), exactly as hand-written Megatron would.

Sharding rules (see ``param_partition_specs``):

- MHSA ``q/k/v`` projections: column-parallel — weight ``[d, d]`` sharded
  ``P(None, "model")``, bias sharded ``P("model")``. Heads split across the
  model axis (head count must divide evenly for efficiency; GSPMD stays
  correct regardless).
- MHSA output projection ``o``: row-parallel — ``P("model", None)``, bias
  replicated; the matmul's contraction over the sharded axis becomes the
  block's single all-reduce.
- Feed-forward ``in``/``out``: the same column->row pair over the 4x
  expansion dim (this is where most conformer/transformer FLOPs are).
- Conformer conv module: REPLICATED. Its GLU split ``[d|d]`` sits exactly
  on the shard boundary of a sharded ``2d`` axis, forcing a reshard; the
  depthwise conv + two pointwise matmuls carry ~5% of block FLOPs — not
  worth the collective traffic.
- Recurrent (LSTM/GRU) stacks, attention decoders, CTC heads: REPLICATED.
  Measured on this hardware (BASELINE.md ablation): the recurrent chain is
  latency-bound, not FLOPs-bound — splitting H would add a per-timestep
  collective to a path whose cost is serial issue latency, and the weights
  are small (27M for the 5xBLSTM flagship). Data parallelism is the right
  axis for the RNN family; the model axis pays off for the parallel-over-T
  encoders at d >= 512.

Optimizer state follows parameters: ``opt_state_shardings`` maps each
optimizer leaf (adam mu/nu mirror the param tree) to its parameter's spec
by path-suffix matching, so resume/re-placement works on existing state;
fresh state can equally be built by running a jitted ``opt.init`` on
already-placed parameters (zeros_like inherits sharding).

The ``data`` axis stays the leading mesh axis, so ``mesh.batch_sharding``
/ ``multihost.distribute_batch`` work unchanged on the 2-D mesh: batches
shard over ``data`` only and are replicated along ``model``.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# (sub-module key, leaf key) -> PartitionSpec for the tensor-parallel
# column->row pairs inside a conformer/transformer block.
_COLUMN_PARALLEL = {"q", "k", "v", "in"}
_ROW_PARALLEL = {"o", "out"}


def make_mesh_2d(num_data: int, num_model: int, devices=None) -> Mesh:
    """A ``(data, model)`` mesh over the first ``num_data*num_model`` devices.

    On real pods the model axis should map to the innermost (fastest-ICI)
    dimension; ``jax.devices()`` order already enumerates ICI-adjacent
    chips consecutively, and the model axis is minor in this reshape, so
    adjacent chips share a model group.
    """
    devices = jax.devices() if devices is None else devices
    n = num_data * num_model
    if n > len(devices):
        raise ValueError(
            f"requested {num_data}x{num_model}={n} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:n]).reshape(num_data, num_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


@functools.lru_cache(maxsize=None)
def make_mesh_3d(num_data: int, num_seq: int, num_model: int) -> Mesh:
    """A ``(data, seq, model)`` mesh composing tensor AND sequence
    parallelism with data parallelism (VERDICT r3 #3).

    Both tp and sp are placement-only GSPMD axes, so composition is pure
    spec arithmetic: the Megatron weight specs name only ``model`` and the
    activation constraint names ``(data, seq)`` — each partitions over its
    axes and replicates over the others automatically. ``model`` is the
    minor (fastest-ICI) axis — its per-block all-reduces are the most
    frequent collective; ``seq`` sits between, so attention gathers ride
    the next ring. Cached so the train loop and ``apply_encoder`` (tracing
    inside jit) build the SAME Mesh object.
    """
    devices = jax.devices()
    n = num_data * num_seq * num_model
    if n > len(devices):
        raise ValueError(
            f"requested {num_data}x{num_seq}x{num_model}={n} devices, "
            f"have {len(devices)}"
        )
    arr = np.asarray(devices[:n]).reshape(num_data, num_seq, num_model)
    return Mesh(arr, (DATA_AXIS, "seq", MODEL_AXIS))


def _path_keys(path) -> list[str]:
    out = []
    for entry in path:
        if hasattr(entry, "key"):
            out.append(str(entry.key))
        elif hasattr(entry, "idx"):
            out.append(str(entry.idx))
        elif hasattr(entry, "name"):
            out.append(str(entry.name))
        else:
            out.append(str(entry))
    return out


def _spec_for(path_keys: list[str], leaf, ndim: int | None = None) -> P:
    """Partition spec for one parameter leaf, by its tree path.

    ``ndim`` overrides the leaf's rank — pipeline composition passes the
    rank net of the stage-stack's two leading axes (pp.py).
    """
    # only conformer/transformer blocks are tensor-parallel; everything
    # else (RNN stacks, decoders, heads, norms, conv modules) replicates
    if ndim is None:
        ndim = np.ndim(leaf)
    if "conformer" not in path_keys:
        return P()
    if "conv" in path_keys:  # conformer conv module: replicated (see module doc)
        return P()
    if "moe" in path_keys:  # expert banks shard over "expert" (ep.py), not tp
        return P()
    name = path_keys[-1]
    parent = path_keys[-2] if len(path_keys) >= 2 else ""
    if parent in _COLUMN_PARALLEL:
        if name == "w" and ndim == 2:
            return P(None, MODEL_AXIS)
        if name == "b" and ndim == 1:
            return P(MODEL_AXIS)
    if parent in _ROW_PARALLEL:
        if name == "w" and ndim == 2:
            return P(MODEL_AXIS, None)
        # row-parallel bias is added after the all-reduce: replicated
    return P()


def param_partition_specs(params):
    """Tree of ``PartitionSpec``s matching ``params``' structure."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(_path_keys(path), leaf), params
    )


def _flatten_spec_paths(param_specs):
    flat, _ = jax.tree_util.tree_flatten_with_path(
        param_specs, is_leaf=lambda x: isinstance(x, P)
    )
    return {"/" + "/".join(_path_keys(path)): spec for path, spec in flat}


def opt_state_shardings(opt_state, param_specs, mesh: Mesh):
    """Shardings for an optimizer-state tree, following the parameters.

    Optax state leaves that mirror the parameter tree (adam/rmsprop moments
    under ``mu``/``nu``/...) carry the full parameter path as a suffix of
    their own path; such leaves take the parameter's spec. Everything else
    (step counts, empty states) replicates. Rank is sanity-checked so a
    coincidental suffix match can never mis-shard a leaf.
    """
    by_path = _flatten_spec_paths(param_specs)

    def place(path, leaf):
        s = "/" + "/".join(_path_keys(path))
        for pstr, spec in by_path.items():
            if s.endswith(pstr) and np.ndim(leaf) >= len(spec):
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(place, opt_state)


def setup_tensor_parallel(mesh: Mesh, params, opt_state=None, batch=None):
    """Place training state for dp x tp under a 2-D mesh.

    Parameters take the Megatron-style specs above; optimizer state follows
    its parameters; the batch shards over the leading ``data`` axis (and is
    replicated along ``model``). With inputs placed this way the ordinary
    jitted train step partitions over both axes — the gradient all-reduce
    over ``data`` and the block-output all-reduces over ``model`` are both
    XLA-inserted collectives riding ICI.
    """
    from .mesh import shard_batch

    specs = param_partition_specs(params)
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    params = jax.device_put(params, shardings)
    if opt_state is not None:
        opt_state = jax.device_put(opt_state, opt_state_shardings(opt_state, specs, mesh))
    if batch is not None:
        batch = shard_batch(mesh, batch)
    return params, opt_state, batch
