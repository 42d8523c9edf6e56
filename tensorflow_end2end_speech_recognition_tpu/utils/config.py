"""Experiment configuration: reference-shaped YAML -> typed configs.

The reference used bare ``yaml.load`` dicts with per-corpus key conventions
(SURVEY.md §5.6, Appendix A) and saved a copy of the config into the model
dir as provenance. This module accepts those key names verbatim (interface
parity per BASELINE.json), fills reference defaults, and materializes the
typed task configs used by the jitted steps. Unknown keys raise — silent
typos in experiment configs are how results get corrupted.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import yaml

from ..frontend.features import FrontendConfig
from ..models.ctc import CTCConfig
from ..models.encoders import EncoderConfig


@dataclass
class ExperimentConfig:
    # experiment identity
    model_type: str = "ctc"  # ctc | multitask_ctc | attention | joint_ctc_attention
    corpus: str = "toy"  # toy | timit | librispeech | csj
    label_type: str = "phone61"
    label_type_sub: str | None = None  # multitask sub-task units
    train_data_size: str | None = None  # librispeech train100h/460h/960h etc.
    data_root: str | None = None  # precomputed-feature corpora root
    # features
    feature: str = "fbank"
    input_size: int = 40
    use_energy: bool = True
    use_delta: bool = True
    cmvn: str = "utterance"  # "utterance" | "speaker" | "none" (SURVEY.md §2.9)
    num_stack: int = 1
    num_skip: int = 1
    splice: int = 0
    # encoder
    encoder_type: str = "blstm"
    num_units: int = 256
    num_layers: int = 2
    num_proj: int | None = None
    num_layers_sub: int = 1
    num_pyramid_levels: int | None = None  # pyramidal 2x reductions cap
    lstm_impl: str | None = None  # accepted for parity; single scan impl here
    # conformer encoder (TPU-first extension)
    num_heads: int = 4
    conv_kernel_size: int = 15
    ff_expansion: int = 4
    compute_dtype: str = "float32"  # "bfloat16": encoder matmuls at 2x MXU
    # rate with f32 accumulation (measured: a wash at d<=256, see BASELINE.md)
    use_peephole: bool = False
    clip_activation: float | None = None
    parameter_init: float = 0.1
    dropout: float = 1.0  # keep-prob, reference DropoutWrapper convention
    bottleneck_dim: int | None = None
    # attention decoder (attention/joint models)
    attention_type: str = "hybrid"
    attention_dim: int = 128
    attention_conv_num_channels: int = 10
    attention_conv_width: int = 101
    decoder_num_units: int = 256
    embedding_dim: int = 128
    scheduled_sampling_prob: float = 0.0
    scheduled_sampling_ramp_max_step: int = 0
    label_smoothing_prob: float = 0.0
    logits_temperature: float = 1.0
    sharpening_factor: float = 1.0
    sigmoid_smoothing: bool = False
    max_decode_length: int = 100
    dropout_decoder: float = 1.0
    dropout_embedding: float = 1.0
    # joint CTC-attention
    ctc_loss_weight: float = 0.0
    main_task_weight: float = 0.8
    # attention-convergence recipe (TPU-first extension, VERDICT r3 #2: the
    # reference's attention models need thousands of updates before the
    # alignment emerges; these schedules make it emerge at short budgets).
    # guided attention (Tachibana et al. 2017): penalize attention mass far
    # from the ideal monotonic diagonal t/T = u/U, annealed to zero so the
    # converged model is unconstrained.
    guided_attention_weight: float = 0.0
    guided_attention_sigma: float = 0.2
    guided_attention_decay_steps: int = 0  # 0 = constant weight
    # joint models: start training CTC-heavy (the CTC head converges in tens
    # of steps and shapes the encoder for monotonic alignment), anneal the
    # mix linearly to ctc_loss_weight over N steps
    ctc_loss_weight_init: float | None = None
    ctc_loss_weight_anneal_steps: int = 0
    # transducer (TPU-first extension; model_type: transducer)
    pred_num_units: int = 256
    pred_num_layers: int = 1
    joint_dim: int = 256
    max_symbols_per_frame: int = 4
    # augmentation (not in the reference; hook per SURVEY.md §7)
    use_specaugment: bool = False
    freq_mask_width: int = 8
    num_freq_masks: int = 2
    time_mask_frac: float = 0.05
    num_time_masks: int = 2
    # training
    batch_size: int = 32
    num_epoch: int = 20
    optimizer: str = "adam"
    learning_rate: float = 1e-3
    decay_start_epoch: int = 5
    decay_rate: float = 0.9
    decay_patient_epoch: int = 1
    warmup_steps: int = 0  # linear LR warmup (transformer-style encoders)
    # gradient accumulation (train/accum.py): split each batch into A
    # microbatches inside the jitted step (lax.scan of grads, ONE update) —
    # activation memory at batch_size/A with full-batch update math. For
    # effective batches larger than HBM allows; composes with every mesh.
    grad_accum_steps: int = 1
    clip_grad_norm: float = 5.0
    weight_decay: float = 0.0
    sort_utt: bool = True
    sort_stop_epoch: int | None = None
    eval_batch_size: int | None = None
    # dynamic batch-size reduction for very long utterances (reference
    # `utils/dataset/base.py` halved batch_size past frame thresholds,
    # SURVEY.md §2.6): cap padded_frames x rows per train batch; long
    # batches emit power-of-two fewer rows (static shapes, <= log2(B)
    # extra XLA programs). None = off. Unit: FRAMES (10 ms default hop).
    max_frames_per_batch: int | None = None
    # data parallelism (TPU-native extension; the reference was single-GPU).
    # num_devices > 1 trains over a 1-D DP mesh: batch sharded over ICI,
    # params/opt-state replicated, gradient psum inserted by XLA.
    num_devices: int | None = None
    # tensor (model) parallelism: num_model_shards > 1 folds the mesh to
    # 2-D (data x model) and shards the conformer/transformer block weights
    # Megatron-style (parallel/tp.py); num_devices stays the TOTAL chips.
    num_model_shards: int | None = None
    # pipeline parallelism (parallel/pp.py; conformer/transformer only):
    # num_pipeline_stages > 1 folds the mesh to 2-D (data x pipe), shards
    # the block stack into contiguous stages along ``pipe``, and streams
    # num_pipeline_microbatches GPipe microbatches through them per step.
    # num_devices stays the TOTAL chips (dp = num_devices / stages).
    num_pipeline_stages: int | None = None
    num_pipeline_microbatches: int | None = None  # default 4 * stages
    # sequence (context) parallelism (parallel/sp.py; conformer/transformer
    # only): num_sequence_shards > 1 folds the mesh to 2-D (data x seq) and
    # shards the encoder's activation TIME axis (weights replicate) — for
    # utterances whose activation footprint exceeds one chip's HBM.
    # num_devices stays the TOTAL chips (dp = num_devices / shards).
    num_sequence_shards: int | None = None
    # Mixture-of-Experts FF (conformer/transformer only): moe_num_experts
    # > 1 swaps each block's final FF for a top-k-gated expert bank
    # (models/conformer.py). num_expert_shards > 1 folds the mesh to 2-D
    # (data x expert) and shards the stacked expert weights over ``expert``
    # (parallel/ep.py); num_devices stays the TOTAL chips.
    moe_num_experts: int | None = None
    moe_top_k: int = 2
    moe_aux_weight: float = 1e-2
    num_expert_shards: int | None = None
    # fully-sharded data parallelism (ZeRO-3, parallel/fsdp.py): with a
    # data-parallel degree > 1, shard parameters AND optimizer moments
    # across the data mesh axis instead of replicating them (weight
    # all-gathers inserted by XLA per use) — 1/N at-rest state per chip,
    # identical numerics. Composes with num_model_shards (ZeRO+Megatron
    # 2-D weight sharding), num_sequence_shards and num_expert_shards;
    # only pipeline stages (shard_map-resident weights) are exclusive.
    fsdp: bool = False
    # conformer/transformer position scheme: "absolute" sinusoids at stack
    # entry; "relative" Transformer-XL rel-pos MHSA (the Conformer paper's
    # scheme — measured 1.8-2x the step on TPU); "rotary" RoPE (relative
    # semantics at ~the absolute cost — prefer on TPU)
    pos_encoding: str = "absolute"
    # >= 0 makes conformer/transformer chunk-causal (each frame sees itself
    # + left_context past frames; causal conv) so the model can STREAM with
    # a bounded per-layer cache. -1 (default) = full bidirectional.
    left_context: int = -1
    # decode
    beam_width: int = 1
    length_penalty: float = 0.0
    # toy corpus controls (this environment has no real corpora on disk)
    # toy_profile "easy": the original well-separated formant corpus (kept
    # for fast convergence tests). "hard": the discriminative benchmark —
    # confusable minimal-pair units, coarticulation, speaker/channel/rate
    # variation, additive noise, word-level transcripts (data/hard_corpus.py;
    # the easy corpus saturated at err 0.0000 by round 3 and can no longer
    # rank models). "harder": the headroom tier — confusability 0.05,
    # 32 speakers, 3 dB SNR floor (train/loop.py) — for when the top
    # family closes in on 0 under "hard" (VERDICT r4 #6). For "hard"/
    # "harder", toy_min_units/toy_max_units count WORDS.
    toy_profile: str = "easy"
    toy_num_utts: int = 128
    toy_min_units: int = 3
    toy_max_units: int = 10
    toy_vocab_size: int | None = None
    toy_seed: int = 0
    # hard/harder-corpus lexicon size (default 50 pseudo-words). Subword
    # (BPE) configs need a lexicon LARGER than their merge vocabulary:
    # on the default 50-word lexicon a bpe_1000 tokenizer memorizes every
    # word whole (50 observed units, ~10 tokens/utt) and the decoder is
    # supervision-starved (round-5 ladder, BASELINE.md); a few hundred
    # words force genuinely sub-lexical units and realistic token counts.
    toy_lexicon_words: int | None = None
    # bound hard/harder-corpus utterance duration by splitting long scripts
    # at inter-word pause midpoints (data/hard_corpus.py). Unstacked configs
    # hit T≈500 frames otherwise, which sits on the remote-toolchain
    # boundary that crashes fit() (BASELINE.md rounds 4-5); 3.9 keeps T≤390.
    max_utt_seconds: float | None = None
    # misc
    seed: int = 0
    save_interval_epochs: int = 1

    @classmethod
    def from_yaml(cls, path: str) -> "ExperimentConfig":
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> "ExperimentConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        # PyYAML 1.1 reads "3e-3" (no dot) as a STRING; reference configs use
        # that notation freely, so coerce strings for float-typed fields
        float_fields = {
            f.name for f in dataclasses.fields(cls)
            if f.type in ("float", "float | None")
        }
        aliases = {  # reference spellings -> ours
            "pretrain_stage": None,  # accepted & ignored
            "num_classes": None,  # derived from label_type
            "dropout_encoder": "dropout",
            "dropout_input": None,
            "attention_weights_tempareture": "sharpening_factor",
            "logits_tempareture": "logits_temperature",
        }
        cfg = {}
        for k, v in raw.items():
            if k in fields:
                if k in float_fields and isinstance(v, str):
                    v = float(v)
                cfg[k] = v
            elif k in aliases:
                if aliases[k]:
                    if aliases[k] in float_fields and isinstance(v, str):
                        v = float(v)
                    cfg[aliases[k]] = v
                else:
                    # accepted-but-ignored reference keys change semantics
                    # silently (e.g. dropout_input) — say so, loudly once
                    import warnings

                    warnings.warn(
                        f"config key {k!r}={v!r} is accepted for reference "
                        "parity but has no effect in this framework",
                        stacklevel=2,
                    )
            else:
                raise KeyError(f"unknown config key {k!r} (see ExperimentConfig)")
        return cls(**cfg)

    def to_yaml(self, path: str):
        with open(path, "w") as f:
            yaml.safe_dump(dataclasses.asdict(self), f, sort_keys=False)

    # ---- derived typed configs -------------------------------------------

    def frontend_config(self) -> FrontendConfig:
        if self.feature == "mfcc":
            # reference MFCC configs: input_size counts cepstra (e.g. 13)
            return FrontendConfig(
                feature_type="mfcc",
                num_ceps=self.input_size,
                use_energy=self.use_energy,
                add_deltas=self.use_delta,
                cmvn=self.cmvn,
            )
        return FrontendConfig(
            num_mels=self.input_size,
            use_energy=self.use_energy,
            add_deltas=self.use_delta,
            cmvn=self.cmvn,
        )

    def encoder_config(self) -> EncoderConfig:
        # 2-D (data x model) meshes need the partition-safe depthwise conv:
        # XLA's SPMD partitioner drops the grouped-conv kernel gradient there
        # (models/conformer.py ConformerSpec.depthwise_impl)
        # 2-D meshes that split T or d need the partition-safe depthwise conv
        # (grouped-conv grads also mispartition when TIME is sharded)
        sp = self.num_sequence_shards or 1
        depthwise = (
            "shifts" if (self.num_model_shards or 1) > 1 or sp > 1 else "conv"
        )
        pp = self.num_pipeline_stages or 1
        if pp > 1:
            if self.encoder_type not in ("conformer", "transformer"):
                raise ValueError(
                    "num_pipeline_stages requires encoder_type conformer/"
                    f"transformer (uniform blocks), got {self.encoder_type!r}"
                )
            if self.num_layers % pp:
                raise ValueError(
                    f"num_layers {self.num_layers} not divisible by "
                    f"num_pipeline_stages {pp}"
                )
        if sp > 1 and self.encoder_type not in ("conformer", "transformer"):
            raise ValueError(
                "num_sequence_shards requires encoder_type conformer/"
                f"transformer (parallel over T), got {self.encoder_type!r}"
            )
        moe = self.moe_num_experts or 0
        if moe > 1:
            if self.encoder_type not in ("conformer", "transformer"):
                raise ValueError(
                    "moe_num_experts requires encoder_type conformer/"
                    f"transformer (MoE feed-forwards), got {self.encoder_type!r}"
                )
            if pp > 1:
                raise ValueError(
                    "moe_num_experts with num_pipeline_stages is not "
                    "supported (the pipelined apply has no MoE FF)"
                )
        ep = self.num_expert_shards or 1
        if ep > 1:
            if moe <= 1:
                raise ValueError(
                    "num_expert_shards needs moe_num_experts > 1 (there is "
                    "no expert bank to shard)"
                )
            if moe % ep:
                raise ValueError(
                    f"moe_num_experts {moe} not divisible by "
                    f"num_expert_shards {ep}"
                )
        return EncoderConfig(
            encoder_type=self.encoder_type,
            num_units=self.num_units,
            num_layers=self.num_layers,
            num_proj=self.num_proj,
            use_peephole=self.use_peephole,
            clip_activation=self.clip_activation,
            parameter_init=self.parameter_init,
            dropout_keep_prob=self.dropout,
            num_layers_sub=self.num_layers_sub,
            num_pyramid_levels=self.num_pyramid_levels,
            input_channels=3 if self.use_delta else 1,
            num_heads=self.num_heads,
            conv_kernel_size=self.conv_kernel_size,
            ff_expansion=self.ff_expansion,
            compute_dtype=self.compute_dtype,
            depthwise_impl=depthwise,
            pipeline_stages=self.num_pipeline_stages,
            pipeline_microbatches=self.num_pipeline_microbatches or 4 * pp,
            # when pp composes with tp (3-D data x pipe x model mesh) the
            # data axis is what remains after BOTH model axes
            pipeline_data_parallel=(
                (self.num_devices or (pp * (self.num_model_shards or 1)))
                // (pp * (self.num_model_shards or 1))
            ),
            pipeline_model_parallel=(self.num_model_shards or 1) if pp > 1 else 1,
            sequence_shards=self.num_sequence_shards,
            # when sp composes with tp (3-D data x seq x model mesh) the
            # data axis is what remains after BOTH model axes
            sequence_data_parallel=(
                (self.num_devices or (sp * (self.num_model_shards or 1)))
                // (sp * (self.num_model_shards or 1))
            ),
            sequence_model_parallel=self.num_model_shards or 1,
            moe_experts=moe,
            moe_top_k=self.moe_top_k,
            moe_aux_weight=self.moe_aux_weight,
            pos_encoding=self.pos_encoding,
            left_context=self.left_context,
        )

    def ctc_config(self, num_classes: int, num_classes_sub: int | None = None) -> CTCConfig:
        # main_task_weight is a TASK-level field (train/ctc_task.py), wired
        # by train/loop.py — not a model property
        return CTCConfig(
            encoder=self.encoder_config(),
            num_classes=num_classes,
            bottleneck_dim=self.bottleneck_dim,
            num_classes_sub=num_classes_sub,
        )
