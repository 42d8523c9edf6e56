"""Training loop: epochs, plateau LR, dev eval, best-on-dev checkpoints.

Rebuilds the reference's per-corpus ``train_ctc.py`` / ``train_attention.py``
do_train loops (SURVEY.md §3.1/§3.2) as one corpus-agnostic driver: the
model dir gets a config copy (provenance, as the reference did), a metrics
CSV, and orbax checkpoints retained by best dev error rate. All compute is
inside jitted steps; the host loop only moves numpy batches and scalars.
"""

from __future__ import annotations

import csv
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data import Dataset, ToyCorpus
from ..frontend.augment import SpecAugmentConfig
from ..models.attention import AttentionConfig
from ..models.seq2seq import Seq2SeqConfig
from ..utils.config import ExperimentConfig
from ..utils.metrics import evaluate_ctc
from . import att_task, ctc_task
from .checkpoint import CheckpointManager
from .ctc_task import CTCTaskConfig
from .att_task import AttTaskConfig
from .lr_controller import LRController
from .optimizer import build_optimizer

MODEL_TYPES = ("ctc", "multitask_ctc", "attention", "joint_ctc_attention",
               "transducer")


def _attach_sub_labels(utts, exp: ExperimentConfig):
    """Multitask: derive sub-task labels from each utterance's transcript."""
    from ..data.tokenizers import CharTokenizer, build_tokenizer

    sub_tok = build_tokenizer(exp.label_type_sub)
    for u in utts:
        if isinstance(sub_tok, CharTokenizer):
            u.sub_ids = sub_tok.encode_text(u.text)
        else:
            u.sub_ids = sub_tok.encode([t for t in u.text.split() if t in sub_tok.unit_to_idx])
    return sub_tok


def build_corpus_splits(exp: ExperimentConfig, need=("train", "dev", "test"),
                        load_features: bool = True):
    """Returns (train_utts, dev_utts, test_utts, tokenizer).

    ``data_root`` set -> the reference's on-disk mode: per-utterance .npy
    features + transcripts.tsv per split (data/npy_corpus.py). Otherwise the
    synthetic toy corpus (no corpora ship with this environment).

    ``need`` limits which splits have their FEATURES loaded (eval/decode
    pass ``("dev", "test")`` so a real corpus's train features never touch
    RAM there); splits not requested return ``[]``. Tokenizer learning only
    reads train *transcripts*, which is cheap.
    """
    if exp.data_root is not None:
        import warnings

        from ..data.npy_corpus import available_splits, load_npy_split, pick_split
        from ..data.tokenizers import build_tokenizer

        names = available_splits(exp.data_root)
        # train split: explicit train_data_size (LibriSpeech train100h/460h/
        # 960h) wins, else "train"
        train_name = (
            exp.train_data_size
            if exp.train_data_size and exp.train_data_size in names
            else pick_split(names, "train")
        )
        dev_name = pick_split(names, "dev")  # "dev" then dev_clean etc.
        test_name = pick_split(names, "test", "eval")
        if test_name is None:
            warnings.warn(
                f"data_root {exp.data_root} has no test/eval split; "
                "reporting the dev split as 'test'"
            )
            test_name = dev_name
        if train_name is None or dev_name is None:
            raise FileNotFoundError(
                f"data_root {exp.data_root} needs train+dev splits; found {names}"
            )
        tok_kwargs = {}
        if exp.label_type.startswith(("bpe", "word")):
            # corpus-derived vocabularies learn from the TRAIN transcripts
            from ..data.npy_corpus import read_transcripts

            tok_kwargs["corpus_texts"] = read_transcripts(exp.data_root, train_name)
        tokenizer = build_tokenizer(exp.label_type, **tok_kwargs)
        load = lambda want, name: (
            load_npy_split(exp.data_root, name, tokenizer, load_features)
            if want in need else []
        )
        train = load("train", train_name)
        dev = load("dev", dev_name)
        test = load("test", test_name)
    else:
        if exp.toy_profile in ("hard", "harder"):
            # the discriminative benchmark corpus (data/hard_corpus.py):
            # confusable units + speaker/channel/noise variation, word
            # transcripts; min/max units count WORDS here. "harder" is the
            # headroom tier (VERDICT r4 #6): the round-4 "hard" sweep saw
            # the strongest CTC family land at dev err 0.0056 — within
            # noise of solved — so this tier halves the within-pair F2 gap
            # (0.05), doubles the speaker inventory (32), and lowers the
            # SNR floor (3 dB) to keep the benchmark discriminating.
            from ..data.hard_corpus import HardCorpus

            harder = exp.toy_profile == "harder"
            corpus = HardCorpus(
                label_type=exp.label_type,
                num_utts=exp.toy_num_utts,
                min_units=exp.toy_min_units,
                max_units=exp.toy_max_units,
                vocab_size=exp.toy_vocab_size,
                seed=exp.toy_seed,
                confusability=0.05 if harder else 0.10,
                num_speakers=32 if harder else 16,
                snr_db=(3.0, 18.0) if harder else (8.0, 25.0),
                max_utt_seconds=exp.max_utt_seconds,
                **({"num_words": exp.toy_lexicon_words}
                   if exp.toy_lexicon_words else {}),
            )
        elif exp.toy_profile != "easy":
            raise ValueError(f"unknown toy_profile {exp.toy_profile!r}")
        else:
            if exp.max_utt_seconds is not None:
                import warnings

                warnings.warn(
                    "max_utt_seconds only applies to toy_profile hard/harder; "
                    "the easy corpus (~2 s utterances) is unaffected"
                )
            corpus = ToyCorpus(
                label_type=exp.label_type,
                num_utts=exp.toy_num_utts,
                min_units=exp.toy_min_units,
                max_units=exp.toy_max_units,
                vocab_size=exp.toy_vocab_size,
                seed=exp.toy_seed,
            )
        utts = corpus.utterances
        n = len(utts)
        n_dev = max(n // 10, 1)
        n_test = max(n // 10, 1)
        train = utts[: n - n_dev - n_test]
        dev = utts[n - n_dev - n_test : n - n_test]
        test = utts[n - n_test :]
        tokenizer = corpus.tokenizer
    if exp.model_type == "multitask_ctc" and exp.label_type_sub:
        sub_tok = _attach_sub_labels(train + dev + test, exp)
        tokenizer.sub_tokenizer = sub_tok  # stashed for task construction
    return train, dev, test, tokenizer


def cmvn_stats_for(exp: ExperimentConfig, task, utts):
    """Speaker-CMVN stats for these utterances (None unless cmvn: speaker).

    Every consumer that builds a ``Dataset`` for a speaker-CMVN model MUST
    pass this: with ``cmvn: speaker`` the frontend itself applies no
    normalization (mask-only), so a batch without cmvn rows feeds the model
    raw-scale features it was never trained on.
    """
    if exp.cmvn != "speaker":
        return None
    from ..frontend.speaker_cmvn import compute_speaker_stats

    return compute_speaker_stats(
        utts, task.frontend, exp.eval_batch_size or exp.batch_size
    )


def _specaug(exp: ExperimentConfig):
    if not exp.use_specaugment:
        return None
    return SpecAugmentConfig(
        freq_mask_width=exp.freq_mask_width,
        num_freq_masks=exp.num_freq_masks,
        time_mask_frac=exp.time_mask_frac,
        num_time_masks=exp.num_time_masks,
    )


def feature_dim_of(utts) -> int | None:
    """Per-frame dim for precomputed [T, D] feature corpora, None for waveforms."""
    arr = utts[0].wav
    return int(arr.shape[1]) if arr.ndim == 2 else None


def build_ctc_task(exp: ExperimentConfig, tokenizer, feature_dim: int | None = None) -> CTCTaskConfig:
    num_sub = None
    if exp.model_type == "multitask_ctc":
        sub_tok = getattr(tokenizer, "sub_tokenizer", None)
        # with label_type_sub: a real hierarchical sub task; else the toy
        # fallback mirrors the main units
        num_sub = sub_tok.num_units if sub_tok is not None else tokenizer.num_units
    return CTCTaskConfig(
        model=exp.ctc_config(tokenizer.num_units, num_sub),
        # precomputed-feature corpora (the reference's .npy mode) bypass the
        # waveform frontend; the on-disk frame dim feeds init_params instead
        frontend=None if feature_dim is not None else exp.frontend_config(),
        num_stack=exp.num_stack,
        num_skip=exp.num_skip,
        splice=exp.splice,
        weight_decay=exp.weight_decay,
        main_task_weight=exp.main_task_weight,
        spec_augment=_specaug(exp),
        feature_dim=feature_dim,
    )


def build_att_task(exp: ExperimentConfig, tokenizer, feature_dim: int | None = None) -> AttTaskConfig:
    model = Seq2SeqConfig(
        encoder=exp.encoder_config(),
        attention=AttentionConfig(
            attention_type=exp.attention_type,
            attention_dim=exp.attention_dim,
            conv_num_channels=exp.attention_conv_num_channels,
            conv_width=exp.attention_conv_width,
            sharpening_factor=exp.sharpening_factor,
            sigmoid_smoothing=exp.sigmoid_smoothing,
        ),
        num_classes=tokenizer.num_units,
        decoder_num_units=exp.decoder_num_units,
        embedding_dim=exp.embedding_dim,
        logits_temperature=exp.logits_temperature,
        scheduled_sampling_prob=exp.scheduled_sampling_prob,
        max_decode_length=exp.max_decode_length,
        dropout_decoder_keep_prob=exp.dropout_decoder,
        dropout_embedding_keep_prob=exp.dropout_embedding,
        ctc_loss_weight=exp.ctc_loss_weight if exp.model_type == "joint_ctc_attention" else 0.0,
    )
    return AttTaskConfig(
        model=model,
        frontend=None if feature_dim is not None else exp.frontend_config(),
        num_stack=exp.num_stack,
        num_skip=exp.num_skip,
        splice=exp.splice,
        weight_decay=exp.weight_decay,
        label_smoothing=exp.label_smoothing_prob,
        scheduled_sampling_ramp_max_step=exp.scheduled_sampling_ramp_max_step,
        spec_augment=_specaug(exp),
        guided_attention_weight=exp.guided_attention_weight,
        guided_attention_sigma=exp.guided_attention_sigma,
        guided_attention_decay_steps=exp.guided_attention_decay_steps,
        ctc_weight_init=exp.ctc_loss_weight_init,
        ctc_weight_anneal_steps=exp.ctc_loss_weight_anneal_steps,
        feature_dim=feature_dim,
    )


def build_transducer_task(exp: ExperimentConfig, tokenizer, feature_dim: int | None = None):
    from ..models.transducer import TransducerConfig
    from . import transducer_task

    model = TransducerConfig(
        encoder=exp.encoder_config(),
        num_classes=tokenizer.num_units,
        pred_num_units=exp.pred_num_units,
        pred_num_layers=exp.pred_num_layers,
        embedding_dim=exp.embedding_dim,
        joint_dim=exp.joint_dim,
        parameter_init=exp.parameter_init,
        pred_dropout_keep_prob=exp.dropout_decoder,
        max_symbols_per_frame=exp.max_symbols_per_frame,
    )
    return transducer_task.TransducerTaskConfig(
        model=model,
        frontend=None if feature_dim is not None else exp.frontend_config(),
        num_stack=exp.num_stack,
        num_skip=exp.num_skip,
        splice=exp.splice,
        weight_decay=exp.weight_decay,
        spec_augment=_specaug(exp),
        feature_dim=feature_dim,
    )


def build_task(exp: ExperimentConfig, tokenizer, feature_dim: int | None = None):
    """(task_config, task_module) for the configured model_type.

    ``feature_dim`` set (from ``feature_dim_of`` on a precomputed-feature
    corpus) switches the task to frontend-free mode: the jitted pipeline
    consumes [B, T, D] feature batches directly (stack/splice still apply).
    """
    if exp.model_type not in MODEL_TYPES:
        raise ValueError(f"unknown model_type {exp.model_type!r}; expected {MODEL_TYPES}")
    if exp.model_type in ("ctc", "multitask_ctc"):
        return build_ctc_task(exp, tokenizer, feature_dim), ctc_task
    if exp.model_type == "transducer":
        from . import transducer_task

        return build_transducer_task(exp, tokenizer, feature_dim), transducer_task
    return build_att_task(exp, tokenizer, feature_dim), att_task


def _to_device_batch(batch, multitask: bool, mesh=None):
    host = {k: v for k, v in batch.items() if k != "names"}
    if multitask and "labels_sub" not in host:
        # toy fallback: sub task mirrors the main labels
        host["labels_sub"] = host["labels"]
        host["label_len_sub"] = host["label_len"]
    if mesh is not None:
        # rows sharded over the DP mesh; at pod scale each process slices
        # its own rows host-side first (parallel/multihost.py), so feature
        # bytes ride host-local IO + ICI only, never DCN
        from ..parallel.multihost import distribute_batch

        return distribute_batch(mesh, host)
    return {k: jnp.asarray(v) for k, v in host.items()}


def fit(exp: ExperimentConfig, model_dir: str, log_every: int = 10, print_fn=print, profile_steps: tuple | None = None):
    """Train per the experiment config; returns summary dict."""
    model_dir = Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)
    exp.to_yaml(model_dir / "config.yml")  # provenance, as the reference saved it

    train_utts, dev_utts, _, tokenizer = build_corpus_splits(exp)
    task, task_mod = build_task(exp, tokenizer, feature_dim_of(train_utts))
    # one corpus sweep for per-speaker mean/var (SURVEY.md §2.9); batches
    # then carry each utterance's speaker stats into the jitted pipeline
    cmvn_stats = cmvn_stats_for(exp, task, train_utts + dev_utts)
    # max_frames_per_batch (SURVEY.md §2.6 dynamic batch reduction) is
    # specified in frames; wav-mode lengths are samples, so hand the
    # frontend hop down for the unit conversion. The row floor keeps
    # reduced batches divisible by grad-accum and the device count.
    wav_mode = train_utts[0].wav.ndim == 1
    frontend = getattr(task, "frontend", None)
    train_ds = Dataset(
        train_utts, exp.batch_size, sort_utt=exp.sort_utt,
        sort_stop_epoch=exp.sort_stop_epoch, seed=exp.seed, cmvn_stats=cmvn_stats,
        max_frames_per_batch=exp.max_frames_per_batch,
        min_batch_rows=exp.grad_accum_steps * (exp.num_devices or 1),
        samples_per_frame=(frontend.frame_step if wav_mode and frontend else 1),
    )
    dev_ds = Dataset(
        dev_utts, exp.eval_batch_size or exp.batch_size, sort_utt=True,
        cmvn_stats=cmvn_stats,
    )
    multitask = exp.model_type == "multitask_ctc"
    is_att = exp.model_type in ("attention", "joint_ctc_attention")
    params = task_mod.init_params(jax.random.PRNGKey(exp.seed), task)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print_fn(f"model: {exp.model_type}/{exp.encoder_type} params={n_params:,}")

    opt = build_optimizer(exp.optimizer, exp.clip_grad_norm)
    opt_state = opt.init(params)
    if exp.batch_size % exp.grad_accum_steps:
        raise ValueError(
            f"batch_size {exp.batch_size} not divisible by "
            f"grad_accum_steps {exp.grad_accum_steps}"
        )
    train_step = task_mod.make_train_step(task, opt,
                                          grad_accum=exp.grad_accum_steps)
    eval_step = task_mod.make_eval_step(task)
    controller = LRController(
        exp.learning_rate, exp.decay_start_epoch, exp.decay_rate, exp.decay_patient_epoch
    )
    ckpts = CheckpointManager(model_dir / "checkpoints")

    csv_path = model_dir / "metrics.csv"
    with open(csv_path, "w", newline="") as f:
        csv.writer(f).writerow(["epoch", "step", "train_loss", "dev_loss", "dev_error_rate", "lr", "utts_per_sec"])
    # TensorBoard event stream alongside the CSV (the reference streamed
    # tf.summary scalars, SURVEY.md §5.5); utils/tb_events.py is the
    # dependency-free writer (clu.metric_writers costs a 42 s TF import)
    from ..utils.tb_events import EventWriter

    events = EventWriter(model_dir / "events")

    rng = jax.random.PRNGKey(exp.seed + 1)
    lr = controller.lr
    step = 0
    best_dev = float("inf")
    # a fully-trained dir resumed past its last epoch skips the loop: keep
    # the previous run's summary instead of returning an empty dict
    summary = {}
    if (Path(model_dir) / "summary.json").exists():
        summary = json.loads((Path(model_dir) / "summary.json").read_text())
    start_epoch = 0
    mesh = None
    tp = exp.num_model_shards or 1
    pp = exp.num_pipeline_stages or 1
    sp = exp.num_sequence_shards or 1
    ep = exp.num_expert_shards or 1
    # tp COMPOSES with sp (3-D data x seq x model) and with pp (3-D data x
    # pipe x model — partial-manual shard_map, parallel/pp.py); expert
    # shards keep their own exclusive 2-D dispatch mesh, and pp+sp would
    # shard the same activations two ways — not supported
    if ep > 1 and (tp > 1 or pp > 1 or sp > 1):
        raise ValueError(
            "num_expert_shards is mutually exclusive with the other "
            "model-sharding axes"
        )
    if pp > 1 and sp > 1:
        raise ValueError(
            "num_pipeline_stages and num_sequence_shards are mutually "
            "exclusive (both shard the encoder activations); "
            "num_model_shards composes with either"
        )
    if exp.fsdp and pp > 1:
        raise ValueError(
            "fsdp cannot combine with pipeline parallelism (stage weights "
            "live inside shard_map, outside GSPMD placement); tp/sp/ep "
            "compose fine"
        )
    if exp.fsdp and not (exp.num_devices and exp.num_devices > tp * sp * ep):
        raise ValueError(
            "fsdp needs a data-parallel degree > 1 (num_devices, divided by "
            "any tp/sp/ep shards, must leave a data axis to shard over)"
        )
    if tp > 1 and sp > 1:
        # 3-D composition: data x seq x model (VERDICT r3 #3). Weights take
        # the Megatron specs over the 3-D mesh (placement below), the
        # encoder's activation constraint shards time over ``seq``.
        from ..parallel.tp import make_mesh_3d

        total = exp.num_devices or (tp * sp)
        if total % (tp * sp):
            raise ValueError(
                f"num_devices {total} not divisible by num_model_shards x "
                f"num_sequence_shards = {tp}x{sp}"
            )
        dp = total // (tp * sp)
        if exp.batch_size % dp:
            raise ValueError(
                f"batch_size {exp.batch_size} not divisible by "
                f"data-parallel degree {dp} (num_devices/(tp*sp))"
            )
        mesh = make_mesh_3d(dp, sp, tp)
        print_fn(f"mesh: {dp}-way data x {sp}-shard sequence x {tp}-way "
                 "tensor parallel"
                 + (" (fsdp: params+moments sharded)" if exp.fsdp else "")
                 + f" ({jax.process_count()} process(es))")
    elif ep > 1:
        from ..parallel.ep import make_mesh_dp_ep

        total = exp.num_devices or ep
        if total % ep:
            raise ValueError(
                f"num_devices {total} not divisible by num_expert_shards {ep}"
            )
        dp = total // ep
        if exp.batch_size % dp:
            raise ValueError(
                f"batch_size {exp.batch_size} not divisible by "
                f"data-parallel degree {dp} (num_devices/num_expert_shards)"
            )
        mesh = make_mesh_dp_ep(dp, ep)
        print_fn(f"mesh: {dp}-way data x {ep}-shard expert parallel"
                 + (" (fsdp: params+moments sharded)" if exp.fsdp else "")
                 + f" ({jax.process_count()} process(es))")
    elif sp > 1:
        from ..parallel.sp import make_mesh_dp_sp

        total = exp.num_devices or sp
        if total % sp:
            raise ValueError(
                f"num_devices {total} not divisible by num_sequence_shards {sp}"
            )
        dp = total // sp
        if exp.batch_size % dp:
            raise ValueError(
                f"batch_size {exp.batch_size} not divisible by "
                f"data-parallel degree {dp} (num_devices/num_sequence_shards)"
            )
        mesh = make_mesh_dp_sp(dp, sp)
        print_fn(f"mesh: {dp}-way data x {sp}-shard sequence parallel"
                 + (" (fsdp: params+moments sharded)" if exp.fsdp else "")
                 + f" ({jax.process_count()} process(es))")
    elif pp > 1:
        from ..parallel import make_mesh_dp_pp
        from ..parallel.pp import make_mesh_dp_pp_tp

        total = exp.num_devices or (pp * tp)
        if total % (pp * tp):
            raise ValueError(
                f"num_devices {total} not divisible by num_pipeline_stages x "
                f"num_model_shards = {pp}x{tp}"
            )
        dp = total // (pp * tp)
        mb = exp.num_pipeline_microbatches or 4 * pp
        for name, b in (("batch_size", exp.batch_size),
                        ("eval_batch_size", exp.eval_batch_size or exp.batch_size)):
            if b % mb:
                raise ValueError(
                    f"{name} {b} not divisible by num_pipeline_microbatches {mb}"
                )
            if (b // mb) % dp:
                raise ValueError(
                    f"{name} {b} / {mb} microbatches leaves {b // mb} rows, "
                    f"not divisible by data-parallel degree {dp}"
                )
        mesh = make_mesh_dp_pp_tp(dp, pp, tp) if tp > 1 else make_mesh_dp_pp(dp, pp)
        print_fn(f"mesh: {dp}-way data x {pp}-stage pipeline"
                 + (f" x {tp}-way tensor parallel" if tp > 1 else "")
                 + f" ({mb} microbatches, {jax.process_count()} process(es))")
    elif (exp.num_devices and exp.num_devices > 1) or tp > 1:
        from ..parallel import make_mesh, make_mesh_2d

        total = exp.num_devices or tp
        if total % tp:
            raise ValueError(
                f"num_devices {total} not divisible by num_model_shards {tp}"
            )
        dp = total // tp
        if exp.batch_size % dp:
            raise ValueError(
                f"batch_size {exp.batch_size} not divisible by "
                f"data-parallel degree {dp} (num_devices/num_model_shards)"
            )
        mesh = make_mesh_2d(dp, tp) if tp > 1 else make_mesh(total)
        print_fn(f"mesh: {dp}-way data x {tp}-way tensor parallel"
                 + (" (fsdp: params+moments sharded)" if exp.fsdp else "")
                 + f" ({jax.process_count()} process(es))")
    if ckpts.latest_epoch is not None:
        # crash/restart recovery (SURVEY.md §5.3): restore the FULL training
        # state — params, optimizer slots, RNG stream, LR-controller state,
        # step counter — so a resumed run is bit-identical to an
        # uninterrupted one (tf.train.Saver persisted optimizer slots too)
        extra_like = {
            "opt_state": opt_state,
            "rng": rng,
            "lr_controller": controller.state_dict(),
            "step": step,
            "best_dev": best_dev,
        }
        start_epoch, state = ckpts.restore(
            {"params": params, "extra": extra_like}, epoch=ckpts.latest_epoch
        )
        params = state["params"]
        extra = state["extra"]
        opt_state = extra["opt_state"]
        rng = jnp.asarray(extra["rng"])
        controller.load_state_dict(extra["lr_controller"])
        lr = controller.lr
        step = int(extra["step"])
        best_dev = float(extra["best_dev"])
        start_epoch += 1
        print_fn(f"resuming from checkpoint epoch {start_epoch - 1}")
    if mesh is not None:
        # after any resume, so restored state is re-placed over the mesh
        if pp > 1:
            # checkpoints stay in the universal per-layer list layout (so
            # eval/decode/serving CLIs restore them on any topology); the
            # resident training state is stage-stacked + sharded over pipe
            from ..parallel import pp_stack_tree, setup_pipeline_parallel

            params = pp_stack_tree(params, pp)
            opt_state = pp_stack_tree(opt_state, pp)
            # model=True (pp x tp): stage weights additionally take their
            # Megatron spec — 2-D (pipe, model) sharding at rest
            params, opt_state, _ = setup_pipeline_parallel(
                mesh, params, opt_state, model=tp > 1)
        elif tp > 1:
            if exp.fsdp:
                # ZeRO-3 x Megatron: the data axis fills each tp-parallel
                # weight's free axis (2-D sharding); replicated leaves
                # shard plain-fsdp style (parallel/fsdp.py)
                from ..parallel.fsdp import setup_fsdp
                from ..parallel.tp import param_partition_specs

                params, opt_state, _ = setup_fsdp(
                    mesh, params, opt_state,
                    base_specs=param_partition_specs(params))
            else:
                from ..parallel import setup_tensor_parallel

                params, opt_state, _ = setup_tensor_parallel(mesh, params, opt_state)
        elif sp > 1:
            # weights replicate over (data, seq); the encoder's activation
            # constraints (parallel/sp.py seq_shard_fn) shard time on entry
            if exp.fsdp:
                # sp shards activations, not weights — its weight base is
                # replication, so ZeRO-3 shards over data exactly as on a
                # 1-D mesh (the 2-D mesh only changes the data-axis extent)
                from ..parallel.fsdp import setup_fsdp

                params, opt_state, _ = setup_fsdp(mesh, params, opt_state)
            else:
                from ..parallel.sp import setup_sequence_parallel

                params, opt_state, _ = setup_sequence_parallel(mesh, params, opt_state)
        elif ep > 1:
            # stacked expert banks shard over (data, expert) on their
            # leading E axis; everything else replicates (parallel/ep.py)
            if exp.fsdp:
                from ..parallel.ep import expert_partition_specs
                from ..parallel.fsdp import setup_fsdp

                params, opt_state, _ = setup_fsdp(
                    mesh, params, opt_state,
                    base_specs=expert_partition_specs(params))
            else:
                from ..parallel.ep import setup_expert_parallel

                params, opt_state, _ = setup_expert_parallel(mesh, params, opt_state)
        elif exp.fsdp:
            # ZeRO-3: params + moments sharded over the data mesh at rest;
            # XLA all-gathers weights per use (parallel/fsdp.py)
            from ..parallel.fsdp import setup_fsdp

            params, opt_state, _ = setup_fsdp(mesh, params, opt_state)
        else:
            from ..parallel import setup_data_parallel

            params, opt_state, _ = setup_data_parallel(mesh, params, opt_state)
    for epoch in range(start_epoch, exp.num_epoch):
        t0 = time.perf_counter()
        losses = []
        n_utts = 0
        from ..data.prefetch import prefetch

        for batch in prefetch(train_ds.batches(epoch)):
            rng, sub = jax.random.split(rng)
            jbatch = _to_device_batch(batch, multitask, mesh)
            if profile_steps and step == profile_steps[0]:
                jax.profiler.start_trace(str(model_dir / "trace"))
            # linear warmup (host-side scalar: no recompile, like LR decay)
            eff_lr = lr * min(1.0, (step + 1) / exp.warmup_steps) if exp.warmup_steps else lr
            if is_att:
                params, opt_state, aux = train_step(params, opt_state, jbatch, eff_lr, sub, step)
            else:
                params, opt_state, aux = train_step(params, opt_state, jbatch, eff_lr, sub)
            step += 1
            if profile_steps and step == profile_steps[1]:
                float(aux["loss"])  # sync before stopping the trace
                jax.profiler.stop_trace()
                print_fn(f"profiler trace written to {model_dir / 'trace'}")
            n_utts += sum(1 for n in batch["names"] if n is not None)
            if step % log_every == 0:
                losses.append(float(aux["loss"]))
                print_fn(f"epoch {epoch} step {step} loss {losses[-1]:.4f} lr {eff_lr:.2e}")
                events.write_scalars(step, {"train/loss": losses[-1],
                                            "train/lr": eff_lr})
        epoch_time = time.perf_counter() - t0
        dev = evaluate_ctc(
            eval_step, params, dev_ds, tokenizer, exp.label_type, epoch,
            # eval batches take the same mesh placement as training batches
            # so they are consistent with the params' sharding under DP
            to_device=(lambda b: _to_device_batch(b, multitask, mesh))
            if mesh is not None else None,
        )
        ups = n_utts / epoch_time
        train_loss = float(np.mean(losses)) if losses else float(aux["loss"])
        print_fn(
            f"epoch {epoch} done: train_loss {train_loss:.4f} "
            f"dev_err {dev['error_rate']:.4f} {ups:.1f} utts/s"
        )
        with open(csv_path, "a", newline="") as f:
            # record the lr actually applied this step (warmup-scaled)
            csv.writer(f).writerow([epoch, step, train_loss, dev["loss"], dev["error_rate"], eff_lr, ups])
        epoch_scalars = {
            "train/epoch_loss": train_loss, "dev/loss": dev["loss"],
            "dev/error_rate": dev["error_rate"], "train/utts_per_sec": ups,
        }
        if "wer" in dev:
            epoch_scalars["dev/wer"] = dev["wer"]
        events.write_scalars(step, epoch_scalars)
        events.flush()
        if dev["error_rate"] < best_dev:
            best_dev = dev["error_rate"]
        # controller advances first so the checkpointed state already
        # reflects this epoch's decision (resume then continues exactly)
        lr = controller.update(epoch, dev["error_rate"])
        if pp > 1:  # persist the universal list layout (see placement above)
            from ..parallel import pp_unstack_tree

            save_params, save_opt = pp_unstack_tree(params), pp_unstack_tree(opt_state)
        else:
            save_params, save_opt = params, opt_state
        ckpts.save(
            epoch,
            {
                "params": save_params,
                "extra": {
                    "opt_state": save_opt,
                    "rng": rng,
                    "lr_controller": controller.state_dict(),
                    "step": step,
                    "best_dev": best_dev,
                },
            },
            dev["error_rate"],
        )
        summary = {
            "epochs": epoch + 1, "steps": step, "train_loss": train_loss,
            "dev_loss": dev["loss"],
            "dev_error_rate": dev["error_rate"], "best_dev_error_rate": best_dev,
            "utts_per_sec": ups,
        }
    events.close()
    with open(model_dir / "summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    try:  # loss/ler curve PNGs, as the reference wrote into its model dir
        from ..utils.plot import plot_training_curves

        plot_training_curves(model_dir)
    except Exception as e:  # plotting must never kill a finished run
        print_fn(f"plotting failed: {e}")
    return summary
