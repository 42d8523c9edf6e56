"""Pipeline parallelism (GPipe-style) over a ``pipe`` mesh axis.

The third mesh axis of the TPU-native scale-out plan (after ``mesh.py``'s
data axis and ``tp.py``'s model axis): the uniform-block encoders —
conformer/transformer stacks, whose layers share one parameter structure
and one activation shape — are split into ``S`` contiguous stages, one per
device along a ``pipe`` axis, and microbatches flow through the stages.
Per-stage weights are *sharded* over the axis (each chip holds ``L/S``
layers), so stacks too large for one chip's HBM train and serve across
ICI neighbours.

Expressed the JAX way: one ``shard_map`` over the mesh, a ``lax.scan``
over ``M + S - 1`` ticks, and a single ``lax.ppermute`` per tick handing
each stage's activation to its successor. Reverse-mode AD transposes the
``ppermute`` into the reverse rotation automatically, so the backward pass
is the mirrored pipeline with no hand-written schedule. The bubble is the
standard GPipe ``(S-1)/(M+S-1)`` — choose ``num_microbatches >= 4*S`` to
amortize.

Scope (measured reasoning, BASELINE.md ablation): the recurrent encoders
are NOT pipelined — a BLSTM layer needs the whole sequence before its
successor can start (forward+backward scans), so layer-granular pipelining
cannot overlap and the latency-bound chain gains nothing. Pipelining here
targets the parallel-over-T conformer/transformer families, where each
block is a dense matmul bundle that fills the MXU per microbatch.

Composition: the specs only name the ``pipe`` (and optionally ``data``)
axes, so the same ``shard_map`` runs on a 1-D pipe mesh or a 2-D
``data x pipe`` mesh — microbatch rows shard over ``data``, stages over
``pipe``, and the gradient all-reduce over ``data`` is inserted by XLA
outside the shard_map as usual.

Reference parity note: the reference is single-device (SURVEY.md §2.10);
this module is part of the rebuild's pod-scale extension, same tier as
``tp.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIPE_AXIS = "pipe"
DATA_AXIS = "data"


def make_mesh_pp(num_stages: int, devices=None) -> Mesh:
    """A 1-D ``(pipe,)`` mesh over the first ``num_stages`` devices."""
    import numpy as np

    devices = jax.devices() if devices is None else devices
    if num_stages > len(devices):
        raise ValueError(f"requested {num_stages} stages, have {len(devices)} devices")
    return Mesh(np.asarray(devices[:num_stages]), (PIPE_AXIS,))


@functools.lru_cache(maxsize=None)
def make_mesh_dp_pp_tp(num_data: int, num_stages: int, num_model: int) -> Mesh:
    """A ``(data, pipe, model)`` mesh composing pipeline AND tensor
    parallelism (VERDICT r3 #3). ``model`` is minor (fastest ICI: its
    per-block all-reduces are the most frequent collective), ``pipe``
    between (one ppermute hop per tick). Cached like the 2-D factory."""
    import numpy as np

    devices = jax.devices()
    n = num_data * num_stages * num_model
    if n > len(devices):
        raise ValueError(
            f"requested {num_data}x{num_stages}x{num_model}={n} devices, "
            f"have {len(devices)}"
        )
    arr = np.asarray(devices[:n]).reshape(num_data, num_stages, num_model)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS, "model"))


@functools.lru_cache(maxsize=None)
def make_mesh_dp_pp(num_data: int, num_stages: int) -> Mesh:
    """A ``(data, pipe)`` mesh over the first ``num_data*num_stages`` devices.

    Cached so the train loop and ``apply_encoder`` (tracing inside jit)
    build the *same* Mesh object. The pipe axis is minor: consecutive
    stages land on ICI-adjacent chips, so the per-tick ``ppermute`` hop
    rides one link.
    """
    import numpy as np

    devices = jax.devices()
    n = num_data * num_stages
    if n > len(devices):
        raise ValueError(
            f"requested {num_data}x{num_stages}={n} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:n]).reshape(num_data, num_stages)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


def stack_layers(layers: list, num_stages: int):
    """Stack ``L`` structurally-identical layer pytrees into one pytree with
    leading axes ``[S, L/S]`` — the layout ``pipeline_apply`` shards over the
    pipe axis (stage-major, so stage ``s`` holds layers ``[s*L/S, (s+1)*L/S)``).
    """
    n = len(layers)
    if n % num_stages:
        raise ValueError(f"{n} layers not divisible by {num_stages} stages")
    per = n // num_stages
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return jax.tree.map(
        lambda a: a.reshape((num_stages, per) + a.shape[1:]), stacked
    )


def unstack_layers(stacked):
    """Inverse of :func:`stack_layers`: back to the per-layer list (for
    checkpoint interop with the sequential parameter layout)."""
    leaves = jax.tree.leaves(stacked)
    s, per = leaves[0].shape[:2]
    flat = jax.tree.map(lambda a: a.reshape((s * per,) + a.shape[2:]), stacked)
    return [jax.tree.map(lambda a: a[i], flat) for i in range(s * per)]


def place_pipeline_params(mesh: Mesh, stacked, pipe_axis: str = PIPE_AXIS):
    """Device-put stage-stacked layer params with the leading stage axis
    sharded over ``pipe`` — each chip materializes only its own stage."""
    sh = NamedSharding(mesh, P(pipe_axis))
    return jax.tree.map(lambda a: jax.device_put(a, sh), stacked)


def _dyn(tree, i):
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, i, keepdims=False), tree
    )


def pipeline_apply(
    stage_fn,
    stage_params,
    x,  # [M, mb, ...] microbatched activations, model-dim already projected
    mb_aux,  # pytree with leading axis M (per-microbatch aux, e.g. masks) | None
    mesh: Mesh,
    *,
    pipe_axis: str = PIPE_AXIS,
    data_axis: str | None = None,
    model_axis: str | None = None,  # tp composed into the pipeline: this
    # mesh axis stays AUTO (GSPMD) inside the shard_map — stage weights
    # arrive still model-sharded and the block matmuls partition over it
    aux_specs=None,  # PartitionSpec tree for mb_aux leaves whose non-leading
    # axes must not follow the default [M, mb-over-data] layout (e.g.
    # per-microbatch rng keys [M, 2] are replicated: pass P() for that leaf)
):
    """Run ``x``'s microbatches through the staged layers; returns [M, mb, ...].

    ``stage_fn(stage_layer_params, act, aux_m, m, stage)`` applies one
    stage's ``L/S`` layers to one microbatch activation ``act`` and must
    preserve its shape (uniform blocks). ``m`` is the (traced) microbatch
    index — fold it into dropout keys so streams differ across microbatches
    — and ``stage`` the (traced) stage index, giving the global layer index
    ``stage * layers_per_stage + l``.

    ``mb_aux`` leaves must carry ``[M, mb, ...]`` leading axes; with a
    ``data_axis`` the ``mb`` rows of both ``x`` and aux shard over it
    (dp x pp in one shard_map). ``x`` is replicated along ``pipe`` — the
    GPipe input stash; the output buffer likewise lives once per stage.

    With ``model_axis`` (dp x pp x tp, VERDICT r3 #3) the shard_map is
    PARTIALLY manual: ``pipe``/``data`` manual as before, ``model`` left
    to GSPMD — Megatron-sharded stage weights partition the block matmuls
    and XLA inserts the per-block all-reduce inside each tick. Stage
    boundaries constrain activations model-replicated so the ppermute hop
    carries replicated data. Partial-manual requires ``check_vma=True``
    (the check_vma=False rematch path re-binds every mesh axis, measured),
    so the stage/commit logic carries explicit pcast-to-varying marks.
    """
    num_stages = mesh.shape[pipe_axis]
    num_mb = x.shape[0]
    # pcast annotations are required under check_vma=True (partial-manual)
    # and harmless no-ops otherwise
    vma_on = model_axis is not None
    pv = (lambda z, ax: jax.lax.pcast(z, ax, to="varying")) if vma_on else (lambda z, ax: z)

    def run(params, xs, aux):
        params = jax.tree.map(lambda a: a[0], params)  # strip stage-block axis
        stage = jax.lax.axis_index(pipe_axis)
        act0 = pv(jnp.zeros(xs.shape[1:], xs.dtype),
                  (pipe_axis,) + ((data_axis,) if data_axis else ()))
        out0 = pv(jnp.zeros_like(xs), (pipe_axis,))

        def tick(carry, t):
            act, out = carry
            inp = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, num_mb - 1), keepdims=False
            )
            act = jnp.where(stage == 0, pv(inp, (pipe_axis,)), act)
            m = t - stage
            aux_m = _dyn(aux, jnp.clip(m, 0, num_mb - 1)) if aux is not None else None
            act = stage_fn(params, act, aux_m, m, stage)
            if model_axis is not None:
                # stage boundary: replicate over the auto model axis so the
                # ppermute hop (and the committed output) carry replicated
                # activations — intra-stage values stay model-sharded
                act = jax.lax.with_sharding_constraint(
                    act, P(*([None] * act.ndim))
                )
            # the last stage commits microbatch t-(S-1); bubbles are no-ops
            w = jnp.clip(t - (num_stages - 1), 0, num_mb - 1)
            cur = jax.lax.dynamic_index_in_dim(out, w, keepdims=False)
            commit = jnp.logical_and(stage == num_stages - 1, t >= num_stages - 1)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(commit, act, cur), w, 0
            )
            act = jax.lax.ppermute(
                act, pipe_axis, [(i, (i + 1) % num_stages) for i in range(num_stages)]
            )
            return (act, out), None

        (_, out), _ = jax.lax.scan(
            tick, (act0, out0), jnp.arange(num_mb + num_stages - 1)
        )
        return out[None]  # [1, M, mb, ...] per stage; only the last is real

    rep = (None, data_axis)  # [M, mb, ...]: mb rows over data, M replicated
    if aux_specs is None:
        aux_specs = jax.tree.map(lambda _: P(*rep), mb_aux)
    manual = {pipe_axis} | ({data_axis} if data_axis else set())
    out = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(pipe_axis), P(*rep), aux_specs),
        out_specs=P(pipe_axis, None, data_axis),
        # stage-varying where/commit logic: under full-manual the vma
        # checker is off (historical behavior); partial-manual needs it on
        check_vma=vma_on,
        axis_names=manual if vma_on else frozenset(),
    )(stage_params, x, mb_aux)
    return out[-1]


def microbatch(x, num_microbatches: int):
    """[B, ...] -> [M, B/M, ...] (leading-axis split, order-preserving)."""
    b = x.shape[0]
    if b % num_microbatches:
        raise ValueError(f"batch {b} not divisible by {num_microbatches} microbatches")
    return x.reshape((num_microbatches, b // num_microbatches) + x.shape[1:])


def apply_conformer_pipelined(
    params,
    spec,
    xs,  # [B, T, D] features
    lengths,  # [B]
    mesh: Mesh,
    num_microbatches: int,
    train: bool = False,
    rng=None,
    keep_prob: float = 1.0,
    *,
    pipe_axis: str = PIPE_AXIS,
    data_axis: str | None = None,
    model_axis: str | None = None,  # tp composed into the pipeline
    stacked_layers=None,  # pre-placed stack_layers() output (training keeps
    # the stacked layout resident so updates stay sharded); built from
    # params["layers"] when None
):
    """Pipelined twin of ``models.conformer.apply_conformer``.

    Same math per microbatch as the sequential apply (block structure,
    masking, final LN), so outputs match it to float tolerance with dropout
    off. With dropout on, keys derive from fold_in(microbatch, global-layer
    -slot) — a well-defined stream, though a different one than the
    sequential layout's.
    """
    from ..models.conformer import (
        _conv_module,
        _dense,
        _dtype_of,
        _ff,
        _ln,
        _mhsa,
        _posenc,
    )
    from ..models.rnn import dropout as _dropout

    spec.validate()
    b, t, _ = xs.shape
    num_stages = mesh.shape[pipe_axis]
    dt = _dtype_of(spec)
    mask = jnp.arange(t)[None, :] < lengths[:, None]  # [B, T]
    x = _dense(params["proj"], xs, dt)
    if spec.pos_encoding == "absolute":
        # relative/rotary stacks inject position inside each MHSA (_mhsa
        # reads spec.pos_encoding + the per-layer pos/pos_u/pos_v params),
        # same as the sequential apply
        x = x + _posenc(t, spec.dim)[None]

    layers = params["layers"]
    if stacked_layers is not None:
        stacked = stacked_layers
        per_stage = jax.tree.leaves(stacked)[0].shape[1]
    elif isinstance(layers, list):
        per_stage = len(layers) // num_stages
        stacked = stack_layers(layers, num_stages)
    else:  # already the [S, L/S, ...] stacked layout (fit() keeps it
        # resident so the per-stage shards persist across update steps)
        stacked = layers
        per_stage = jax.tree.leaves(stacked)[0].shape[1]
    use_drop = train and rng is not None
    mb_keys = (
        jax.vmap(lambda m: jax.random.fold_in(rng, m))(jnp.arange(num_microbatches))
        if use_drop
        else jnp.zeros((num_microbatches, 2), jnp.uint32)
    )

    def drop(z, key, slot):
        if not use_drop:
            return z
        return _dropout(jax.random.fold_in(key, slot), z, keep_prob, train)

    def stage_fn(stage_layers, act, aux, m, stage):
        msk, key = aux
        for li in range(per_stage):
            p = jax.tree.map(lambda a: a[li], stage_layers)
            gl = stage * per_stage + li  # global layer index (traced)
            if spec.block == "transformer":
                act = act + drop(_mhsa(p["mhsa"], act, msk, spec), key, 4 * gl + 1)
                act = act + drop(_ff(p["ff"], act, dt), key, 4 * gl + 3)
            else:
                act = act + 0.5 * drop(_ff(p["ff1"], act, dt), key, 4 * gl)
                act = act + drop(_mhsa(p["mhsa"], act, msk, spec), key, 4 * gl + 1)
                act = act + drop(_conv_module(p["conv"], act, msk, spec), key, 4 * gl + 2)
                act = act + 0.5 * drop(_ff(p["ff2"], act, dt), key, 4 * gl + 3)
                act = _ln(p["ln"], act)
        return act

    out = pipeline_apply(
        stage_fn,
        stacked,
        microbatch(x, num_microbatches),
        (microbatch(mask, num_microbatches), mb_keys),
        mesh,
        pipe_axis=pipe_axis,
        data_axis=data_axis,
        model_axis=model_axis,
        aux_specs=(P(None, data_axis), P()),  # keys replicate across data
    )
    x = out.reshape(b, t, spec.dim)
    if spec.block == "transformer":
        x = _ln(params["ln_out"], x)
    return x * mask[..., None]


def _is_conformer_params(tree) -> bool:
    return isinstance(tree, dict) and "proj" in tree and "layers" in tree


def _map_conformer_subtrees(tree, fn):
    """Apply ``fn`` to every conformer parameter dict found in ``tree``.

    Walks dicts, lists, tuples, and NamedTuples (so optimizer states whose
    moment trees mirror the parameters — adam mu/nu — are converted the
    same way the parameters are)."""
    if _is_conformer_params(tree):
        return fn(tree)
    if isinstance(tree, dict):
        return {k: _map_conformer_subtrees(v, fn) for k, v in tree.items()}
    if isinstance(tree, tuple) and hasattr(tree, "_fields"):
        return type(tree)(*(_map_conformer_subtrees(v, fn) for v in tree))
    if isinstance(tree, (list, tuple)):
        return type(tree)(_map_conformer_subtrees(v, fn) for v in tree)
    return tree


def pp_stack_tree(tree, num_stages: int):
    """Convert every conformer ``layers`` list in a parameter/optimizer tree
    to the stage-stacked ``[S, L/S, ...]`` layout ``pipeline_apply`` shards.
    No-op on subtrees already stacked."""

    def fn(p):
        if isinstance(p["layers"], list):
            return {**p, "layers": stack_layers(p["layers"], num_stages)}
        return p

    return _map_conformer_subtrees(tree, fn)


def pp_unstack_tree(tree):
    """Inverse of :func:`pp_stack_tree` — back to the per-layer list layout
    every non-pipelined code path (checkpoints, eval CLIs, serving exports)
    uses. No-op on subtrees already in list layout."""

    def fn(p):
        if not isinstance(p["layers"], list):
            return {**p, "layers": unstack_layers(p["layers"])}
        return p

    return _map_conformer_subtrees(tree, fn)


def pipeline_param_specs(tree, model: bool = False):
    """``PartitionSpec`` tree for a stage-stacked parameter tree: stacked
    layer leaves shard their leading stage axis over ``pipe``; everything
    else replicates (small projections/norms + non-encoder weights).

    ``model=True`` (dp x pp x tp): each stacked layer leaf ADDITIONALLY
    takes its Megatron spec (tp.py) on the axes after the two stage-stack
    dims — e.g. an mhsa q weight [S, L/S, d, d] shards
    P("pipe", None, None, "model"), 2-D at rest."""
    from .tp import _path_keys, _spec_for

    def spec_for(path, leaf):
        keys = _path_keys(path)
        if "layers" in keys and "conformer" in keys:
            if model:
                sub = _spec_for(keys, leaf, ndim=max(leaf.ndim - 2, 0))
                return P(PIPE_AXIS, None, *sub)
            return P(PIPE_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, tree)


def setup_pipeline_parallel(mesh: Mesh, params, opt_state=None, batch=None,
                            model: bool = False):
    """Place training state for dp x pp under a ``(data, pipe)`` mesh.

    ``params``/``opt_state`` must already be in the stacked layout
    (:func:`pp_stack_tree`). Stage weights shard over ``pipe`` — each chip
    holds only its own ``L/S`` layers (and their optimizer moments); the
    rest replicates. Batches shard over ``data``. The jitted train step
    then partitions over both axes: XLA inserts the gradient all-reduce
    over ``data``, and the explicit shard_map inside the encoder runs the
    stage pipeline over ``pipe``.
    """
    from .mesh import shard_batch
    from .tp import opt_state_shardings

    specs = pipeline_param_specs(params, model=model)
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs, is_leaf=lambda x: isinstance(x, P)
    )
    params = jax.device_put(params, shardings)
    if opt_state is not None:
        opt_state = jax.device_put(
            opt_state, opt_state_shardings(opt_state, specs, mesh)
        )
    if batch is not None:
        batch = shard_batch(mesh, batch)
    return params, opt_state, batch
