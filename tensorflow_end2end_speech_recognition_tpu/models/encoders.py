"""Encoder zoo: (B)LSTM, (B)GRU, pyramidal BLSTM, VGG-conv+RNN, pure-CNN,
multitask taps — the full factory surface of the reference's
``models/encoders/load_encoder.py`` + ``models/encoders/core/*`` (SURVEY.md
§2.5), rebuilt as functional JAX on the fused scans in ``rnn.py``.

Registry keys (reference config ``encoder_type``): ``lstm``, ``blstm``,
``gru``, ``bgru``, ``pyramidal_blstm`` (alias ``pblstm``), ``vgg_blstm``,
``vgg_lstm``, ``cnn_zhang``, ``multitask_blstm``, ``multitask_lstm``; plus
the TPU-first extensions ``conformer`` and ``transformer`` (conformer.py).

TPU notes: pyramidal reduction concatenates adjacent frame pairs between
layers (LAS-style 2x time halving, so attention sees T/2^(L-1)); VGG blocks
are NHWC ``lax.conv`` + max-pool lowered straight onto the MXU; everything is
static-shape with true lengths carried alongside.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .rnn import (
    RNNSpec,
    bidirectional_scan,
    dropout,
    init_bidirectional,
    init_rnn_params,
    rnn_scan,
)


class EncoderConfig(NamedTuple):
    encoder_type: str = "blstm"
    num_units: int = 256
    num_layers: int = 2
    num_proj: int | None = None
    use_peephole: bool = False
    clip_activation: float | None = None
    parameter_init: float = 0.1
    dropout_keep_prob: float = 1.0  # output keep prob, reference DropoutWrapper
    # multitask tap: encoder layer index (1-based) whose output feeds the sub head
    num_layers_sub: int = 1
    # pyramidal: number of 2x time reductions (None = between every layer
    # pair, i.e. num_layers-1). Joint CTC heads need T' >= U: cap this.
    num_pyramid_levels: int | None = None
    # conv frontends: input is [B, T, freq * channels] with delta features as channels
    input_channels: int = 3
    # cnn_zhang fully-connected head widths
    fc_units: tuple = (1024,)
    compute_dtype: str = "float32"  # "bfloat16" for MXU-rate gate matmuls
    # conformer (TPU-first extension; everything parallel over T)
    num_heads: int = 4
    conv_kernel_size: int = 15
    ff_expansion: int = 4
    # "conv" | "shifts": grouped-conv vs partition-safe depthwise impl —
    # "shifts" is REQUIRED under 2-D (data x model) meshes (conformer.py)
    depthwise_impl: str = "conv"
    # pipeline parallelism (parallel/pp.py; conformer/transformer only):
    # > 1 splits the block stack into stages over a ``pipe`` mesh axis and
    # streams microbatches through them (GPipe). pipeline_data_parallel is
    # the data-axis width of the same mesh (total chips = dp * stages).
    pipeline_stages: int | None = None
    pipeline_microbatches: int = 8
    pipeline_data_parallel: int = 1
    # tensor-parallel degree composed INTO the pipeline (3-D data x pipe x
    # model mesh; parallel/pp.py partial-manual shard_map — model stays an
    # AUTO axis so the Megatron weight shardings partition each stage)
    pipeline_model_parallel: int = 1
    # sequence (context) parallelism (parallel/sp.py; conformer/transformer
    # only): > 1 shards the activation TIME axis over a ``seq`` mesh axis
    # (weights replicate; XLA derives the attention gathers + conv halos
    # from one constraint per block). sequence_data_parallel is the data-
    # axis width of the same mesh (total chips = dp * seq shards).
    sequence_shards: int | None = None
    sequence_data_parallel: int = 1
    # tensor-parallel degree of the SAME mesh when sp composes with tp
    # (3-D data x seq x model — parallel/tp.py make_mesh_3d); only used to
    # rebuild the mesh for the activation constraint, the weight specs are
    # placement-side (train/loop.py)
    sequence_model_parallel: int = 1
    # Mixture-of-Experts FF (conformer/transformer only): > 1 swaps each
    # block's final FF for a top-k-gated expert bank; stacked expert weights
    # shard over an ``expert`` mesh axis via parallel/ep.py
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_aux_weight: float = 1e-2
    # "absolute" sinusoids at stack entry | "relative" Transformer-XL
    # rel-pos MHSA (conformer/transformer; models/conformer.py)
    pos_encoding: str = "absolute"
    # >= 0: chunk-causal conformer/transformer (windowed attention +
    # causal conv) — trains offline, streams with a bounded cache
    # (models/conformer_stream.py); -1 = full bidirectional
    left_context: int = -1

    @property
    def bidirectional(self) -> bool:
        return self.encoder_type in (
            "blstm", "bgru", "pyramidal_blstm", "pblstm", "vgg_blstm", "multitask_blstm",
        )

    @property
    def cell(self) -> str:
        return "gru" if "gru" in self.encoder_type else "lstm"

    @property
    def is_pyramidal(self) -> bool:
        return self.encoder_type in ("pyramidal_blstm", "pblstm")

    @property
    def has_vgg(self) -> bool:
        return self.encoder_type in ("vgg_blstm", "vgg_lstm")

    @property
    def is_multitask(self) -> bool:
        return self.encoder_type in ("multitask_blstm", "multitask_lstm")

    @property
    def output_dim(self) -> int:
        if self.encoder_type == "cnn_zhang":
            return self.fc_units[-1]
        if self.encoder_type in ("conformer", "transformer"):
            return self.num_units
        d = self.num_proj or self.num_units
        return d * (2 if self.bidirectional else 1)

    def conformer_spec(self):
        from .conformer import ConformerSpec

        return ConformerSpec(
            dim=self.num_units, num_layers=self.num_layers,
            num_heads=self.num_heads, conv_kernel_size=self.conv_kernel_size,
            ff_expansion=self.ff_expansion, compute_dtype=self.compute_dtype,
            block=self.encoder_type, depthwise_impl=self.depthwise_impl,
            moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
            moe_aux_weight=self.moe_aux_weight,
            pos_encoding=self.pos_encoding,
            left_context=self.left_context,
        )

    def spec(self) -> RNNSpec:
        return RNNSpec(
            cell=self.cell,
            num_units=self.num_units,
            num_proj=self.num_proj,
            use_peephole=self.use_peephole,
            clip_activation=self.clip_activation,
            compute_dtype=self.compute_dtype,
        )


class EncoderOutput(NamedTuple):
    outputs: jnp.ndarray  # [B, T', H]
    lengths: jnp.ndarray  # [B]
    sub_outputs: jnp.ndarray | None = None  # multitask tap
    sub_lengths: jnp.ndarray | None = None
    # weighted MoE load-balance loss (conformer/transformer with
    # moe_experts > 1); the train tasks add it to their objective
    aux_loss: jnp.ndarray | None = None


ENCODER_TYPES = (
    "lstm", "blstm", "gru", "bgru", "pyramidal_blstm", "pblstm",
    "vgg_blstm", "vgg_lstm", "cnn_zhang", "multitask_blstm", "multitask_lstm",
    "conformer", "transformer",
)


def _conv_init(key, kh, kw, cin, cout, scale):
    wkey, _ = jax.random.split(key)
    fan_in = kh * kw * cin
    w = jax.random.normal(wkey, (kh, kw, cin, cout)) * jnp.sqrt(2.0 / fan_in)
    return {"w": w.astype(jnp.float32), "b": jnp.zeros((cout,), jnp.float32)}


def _conv2d(p, x, stride=(1, 1)):
    # x: [B, T, F, C] NHWC, SAME padding
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride, padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y + p["b"]


def _maxpool(x, window, stride):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, window[0], window[1], 1), (1, stride[0], stride[1], 1), "SAME",
    )


_VGG_CHANNELS = ((64, 64), (128, 128))  # two blocks, per Hori et al. 2017


def _init_vgg(key, cin, scale):
    params = []
    keys = jax.random.split(key, sum(len(b) for b in _VGG_CHANNELS))
    i = 0
    c = cin
    for block in _VGG_CHANNELS:
        bp = []
        for cout in block:
            bp.append(_conv_init(keys[i], 3, 3, c, cout, scale))
            c = cout
            i += 1
        params.append(bp)
    return params


def _apply_vgg(params, x, lengths):
    """x: [B, T, F, C]. Two conv-conv-pool blocks; time and freq halve twice."""
    for bp in params:
        for p in bp:
            x = jax.nn.relu(_conv2d(p, x))
        x = _maxpool(x, (2, 2), (2, 2))
    b, t, f, c = x.shape
    out = x.reshape(b, t, f * c)
    out_len = -(-lengths // 4)  # two stride-2 pools over time
    # re-zero the pad region (pooling smears values across the boundary)
    mask = (jnp.arange(t)[None, :] < out_len[:, None])[..., None]
    return out * mask, out_len


def _split_freq_channels(xs, channels):
    """[B, T, F*C] with features laid out [static|delta|deltadelta] -> [B, T, F, C]."""
    b, t, d = xs.shape
    if d % channels:
        raise ValueError(f"feature dim {d} not divisible by {channels} channels")
    f = d // channels
    return jnp.moveaxis(xs.reshape(b, t, channels, f), 2, 3)


def init_encoder(key, cfg: EncoderConfig, input_dim: int):
    """Build the parameter pytree for the configured encoder."""
    if cfg.encoder_type not in ENCODER_TYPES:
        raise ValueError(
            f"unknown encoder_type {cfg.encoder_type!r}; expected one of {ENCODER_TYPES}"
        )
    params = {}
    spec = cfg.spec()
    keys = jax.random.split(key, cfg.num_layers + 2)
    dim = input_dim

    if cfg.encoder_type in ("conformer", "transformer"):
        from .conformer import init_conformer

        return {"conformer": init_conformer(keys[0], cfg.conformer_spec(), input_dim)}

    if cfg.has_vgg:
        params["vgg"] = _init_vgg(keys[-1], cfg.input_channels, cfg.parameter_init)
        freq = input_dim // cfg.input_channels
        dim = -(-freq // 4) * _VGG_CHANNELS[-1][-1]

    if cfg.encoder_type == "cnn_zhang":
        # Zhang et al. 2017-style: conv tower pooling frequency only (time is
        # preserved for CTC), then per-frame FC stack.
        conv_channels = (128, 128, 256, 256)
        ck = jax.random.split(keys[-1], len(conv_channels))
        c = cfg.input_channels
        convs = []
        for i, cout in enumerate(conv_channels):
            convs.append(_conv_init(ck[i], 5, 3, c, cout, cfg.parameter_init))
            c = cout
        params["convs"] = convs
        freq = input_dim // cfg.input_channels
        pooled_freq = freq
        for i in range(len(conv_channels)):
            if i % 2 == 1:
                pooled_freq = -(-pooled_freq // 2)
        dim = pooled_freq * conv_channels[-1]
        fcs = []
        fk = jax.random.split(keys[0], len(cfg.fc_units))
        for i, width in enumerate(cfg.fc_units):
            fcs.append({
                "w": jax.random.uniform(fk[i], (dim, width), jnp.float32,
                                        -cfg.parameter_init, cfg.parameter_init),
                "b": jnp.zeros((width,), jnp.float32),
            })
            dim = width
        params["fcs"] = fcs
        return params

    layers = []
    for layer in range(cfg.num_layers):
        if cfg.bidirectional:
            layers.append(init_bidirectional(keys[layer], spec, dim, cfg.parameter_init))
            dim = 2 * spec.out_dim
        else:
            layers.append(init_rnn_params(keys[layer], spec, dim, cfg.parameter_init))
            dim = spec.out_dim
        if cfg.is_pyramidal and layer < (
            cfg.num_pyramid_levels if cfg.num_pyramid_levels is not None else cfg.num_layers - 1
        ):
            dim = dim * 2  # adjacent-pair concat before the next layer
    params["layers"] = layers
    return params


def _pyramid_reduce(xs, lengths):
    """Concat adjacent frame pairs: [B, T, H] -> [B, ceil(T/2), 2H]."""
    b, t, h = xs.shape
    if t % 2:
        xs = jnp.pad(xs, ((0, 0), (0, 1), (0, 0)))
        t += 1
    out = xs.reshape(b, t // 2, 2 * h)
    new_len = -(-lengths // 2)
    mask = (jnp.arange(t // 2)[None, :] < new_len[:, None])[..., None]
    return out * mask, new_len


def apply_encoder(
    params,
    cfg: EncoderConfig,
    xs: jnp.ndarray,  # [B, T, D]
    lengths: jnp.ndarray,  # [B]
    train: bool = False,
    rng: jax.Array | None = None,
    pallas_t_cap: int = 400,  # input length beyond which the LSTM stack
    # rides lax.scan — the only multi-kernel boundary that has held across
    # rounds 4-5 (the round-5 preflight's 512 pass was followed by a T=502
    # fit() worker crash the same day; see lstm_kernel.pallas_fits)
) -> EncoderOutput:
    spec = cfg.spec()
    drop_keys = (
        jax.random.split(rng, cfg.num_layers) if (train and rng is not None) else None
    )

    if cfg.encoder_type in ("conformer", "transformer"):
        if (
            cfg.pipeline_stages
            and cfg.pipeline_stages > 1
            and not isinstance(params["conformer"]["layers"], list)
        ):
            # stage-stacked layout == fit() placed the state over the
            # (data, pipe) mesh; everything else (eval/decode CLIs, serving
            # exports, single-chip restores) keeps the per-layer list layout
            # and takes the numerically equal sequential apply below
            from ..parallel.pp import (
                apply_conformer_pipelined,
                make_mesh_dp_pp,
                make_mesh_dp_pp_tp,
            )

            tp = max(cfg.pipeline_model_parallel, 1)
            if tp > 1:  # pp composed with tp: 3-D (data, pipe, model)
                mesh = make_mesh_dp_pp_tp(
                    max(cfg.pipeline_data_parallel, 1), cfg.pipeline_stages, tp
                )
            else:
                mesh = make_mesh_dp_pp(
                    max(cfg.pipeline_data_parallel, 1), cfg.pipeline_stages
                )
            out = apply_conformer_pipelined(
                params["conformer"], cfg.conformer_spec(), xs, lengths,
                mesh, cfg.pipeline_microbatches, train=train, rng=rng,
                keep_prob=cfg.dropout_keep_prob, data_axis="data",
                model_axis="model" if tp > 1 else None,
            )
            return EncoderOutput(out, lengths)

        from .conformer import apply_conformer

        shard_fn = None
        if cfg.sequence_shards and cfg.sequence_shards > 1:
            # sequence parallelism: constrain activations [rows over data,
            # time over seq]; the caller places its inputs over the same
            # (data, seq) mesh (fit() via setup_sequence_parallel). When
            # fewer devices are visible than the config asks for (eval/
            # decode CLIs restoring a seq-parallel checkpoint on one chip),
            # skip the constraint — the math is placement-independent.
            import jax as _jax

            from ..parallel.sp import make_mesh_dp_sp, seq_shard_fn

            dp = max(cfg.sequence_data_parallel, 1)
            tp = max(cfg.sequence_model_parallel, 1)
            n_need = dp * cfg.sequence_shards * tp
            if len(_jax.devices()) >= n_need:
                if tp > 1:  # sp composed with tp: 3-D (data, seq, model)
                    from ..parallel.tp import make_mesh_3d

                    mesh = make_mesh_3d(dp, cfg.sequence_shards, tp)
                else:
                    mesh = make_mesh_dp_sp(dp, cfg.sequence_shards)
                shard_fn = seq_shard_fn(mesh)

        moe = bool(cfg.moe_experts and cfg.moe_experts > 1)
        out = apply_conformer(
            params["conformer"], cfg.conformer_spec(), xs, lengths,
            train=train, rng=rng, keep_prob=cfg.dropout_keep_prob,
            shard_fn=shard_fn, return_aux=moe,
        )
        if moe:
            out, aux = out
            return EncoderOutput(out, lengths, aux_loss=aux)
        return EncoderOutput(out, lengths)

    if cfg.encoder_type == "cnn_zhang":
        x = _split_freq_channels(xs, cfg.input_channels)
        for i, p in enumerate(params["convs"]):
            x = jax.nn.relu(_conv2d(p, x))
            if i % 2 == 1:
                x = _maxpool(x, (1, 2), (1, 2))  # pool frequency only
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        for i, p in enumerate(params["fcs"]):
            x = jnp.matmul(x, p["w"], preferred_element_type=jnp.float32) + p["b"]
            if i < len(params["fcs"]) - 1:
                x = jax.nn.relu(x)
            if drop_keys is not None:
                x = dropout(drop_keys[min(i, cfg.num_layers - 1)], x, cfg.dropout_keep_prob, train)
        mask = (jnp.arange(t)[None, :] < lengths[:, None])[..., None]
        return EncoderOutput(x * mask, lengths)

    if cfg.has_vgg:
        x = _split_freq_channels(xs, cfg.input_channels)
        xs, lengths = _apply_vgg(params["vgg"], x, lengths)

    # Long-sequence robustness: multi-kernel programs over long inputs
    # fault the remote TPU worker/compiler even though each kernel compiles
    # and runs alone (measured: 5-layer pyramid at T=1198 faults both as
    # all-Pallas and as mixed scan+Pallas; a joint attention model's FULL
    # backward crashes the compiler already at T=400 with Pallas encoder
    # kernels but compiles all-scan; the T=400 CTC flagship stack is fine)
    # — so the WHOLE stack rides the lax.scan path (0.77x the kernel) when
    # the input exceeds the caller's measured-safe cap.
    if xs.shape[1] > pallas_t_cap and spec.impl == "auto":
        spec = spec._replace(impl="scan")

    sub_outputs = sub_lengths = None
    for layer, p in enumerate(params["layers"]):
        if cfg.bidirectional:
            xs = bidirectional_scan(p, spec, xs, lengths)
        else:
            xs, _ = rnn_scan(p, spec, xs, lengths)
        if drop_keys is not None:
            xs = dropout(drop_keys[layer], xs, cfg.dropout_keep_prob, train)
        if cfg.is_multitask and layer + 1 == cfg.num_layers_sub:
            sub_outputs, sub_lengths = xs, lengths
        if cfg.is_pyramidal and layer < (
            cfg.num_pyramid_levels if cfg.num_pyramid_levels is not None else cfg.num_layers - 1
        ):
            xs, lengths = _pyramid_reduce(xs, lengths)
    return EncoderOutput(xs, lengths, sub_outputs, sub_lengths)
