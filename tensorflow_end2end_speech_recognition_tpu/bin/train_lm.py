"""Train an RNN-LM on corpus transcripts for shallow fusion.

    python -m tensorflow_end2end_speech_recognition_tpu.bin.train_lm \
        configs/ls960_joint.yml /tmp/lm_dir [--epochs N]

Uses the acoustic config's corpus/label_type to get transcripts and a
matching vocabulary (incl. sos/eos ids), so the LM drops straight into
``bin/decode.py --lm-dir``.
"""

from __future__ import annotations

import argparse

from ..utils.jax_setup import setup as _jax_setup
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models.lm import LMConfig
from ..train.checkpoint import CheckpointManager
from ..train.lm_task import LMTaskConfig, init_params, make_eval_step, make_train_step
from ..train.loop import build_corpus_splits
from ..train.optimizer import build_optimizer
from ..utils.config import ExperimentConfig


def _batches(utts, batch_size, u_pad, seed):
    rng = np.random.RandomState(seed)
    order = rng.permutation(len(utts))
    for start in range(0, len(order), batch_size):
        idx = order[start : start + batch_size]
        n_real = len(idx)
        # modulo fill (works for batch_size >> len(utts) too); fill rows get
        # weight 0 so neither the loss nor the perplexity denominator counts
        # them (same convention as data/dataset.py short-batch handling)
        fill = [order[(j - n_real) % len(order)] for j in range(n_real, batch_size)]
        idx = np.concatenate([idx, np.asarray(fill, order.dtype)]) if fill else idx
        labels = np.full((batch_size, u_pad), -1, np.int32)
        label_len = np.zeros((batch_size,), np.int32)
        weight = np.zeros((batch_size,), np.float32)
        weight[:n_real] = 1.0
        for j, i in enumerate(idx):
            ids = utts[i].label_ids[:u_pad]
            labels[j, : len(ids)] = ids
            label_len[j] = len(ids)
        yield {
            "labels": jnp.asarray(labels),
            "label_len": jnp.asarray(label_len),
            "weight": jnp.asarray(weight),
        }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="acoustic experiment YAML (provides corpus + units)")
    ap.add_argument("lm_dir")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--num-units", type=int, default=256)
    ap.add_argument("--embedding-dim", type=int, default=128)
    ap.add_argument("--num-layers", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--learning-rate", type=float, default=1e-3)
    args = ap.parse_args(argv)
    if args.epochs < 1:
        raise SystemExit("--epochs must be >= 1")
    _jax_setup()

    exp = ExperimentConfig.from_yaml(args.config)
    # labels only: the LM consumes token ids — loading a real corpus's
    # acoustic features (tens of GB for LS-960) here would be pure waste
    train_utts, dev_utts, _, tokenizer = build_corpus_splits(
        exp, need=("train", "dev"), load_features=False
    )
    # vocab matches the attention task: units + sos + eos
    cfg = LMConfig(
        vocab=tokenizer.num_units + 2,
        num_units=args.num_units,
        embedding_dim=args.embedding_dim,
        num_layers=args.num_layers,
    )
    task = LMTaskConfig(model=cfg)
    params = init_params(jax.random.PRNGKey(exp.seed), task)
    opt = build_optimizer("adam", clip_grad_norm=5.0)
    opt_state = opt.init(params)
    train_step = make_train_step(task, opt)
    eval_step = make_eval_step(task)

    lm_dir = Path(args.lm_dir)
    lm_dir.mkdir(parents=True, exist_ok=True)
    (lm_dir / "lm_config.json").write_text(json.dumps(cfg._asdict()))
    ckpts = CheckpointManager(lm_dir / "checkpoints")

    u_pad = max(len(u.label_ids) for u in train_utts) + 1
    rng = jax.random.PRNGKey(exp.seed + 7)
    for epoch in range(args.epochs):
        for batch in _batches(train_utts, args.batch_size, u_pad, exp.seed + epoch):
            rng, sub = jax.random.split(rng)
            params, opt_state, aux = train_step(params, opt_state, batch, args.learning_rate, sub)
        nll = tok = 0.0
        for batch in _batches(dev_utts, args.batch_size, u_pad, 0):
            n, t = eval_step(params, batch)
            nll += float(n)
            tok += float(t)
        ppl = float(np.exp(nll / max(tok, 1)))
        print(f"epoch {epoch}: train_loss {float(aux['loss']):.4f} dev_ppl {ppl:.2f}")
        ckpts.save(epoch, {"params": params}, ppl)
    print("FINAL dev_ppl", ppl)


def load_lm(lm_dir):
    """(lm_params, LMConfig) from a train_lm model dir."""
    lm_dir = Path(lm_dir)
    cfg = LMConfig(**json.loads((lm_dir / "lm_config.json").read_text()))
    params = init_params(jax.random.PRNGKey(0), LMTaskConfig(model=cfg))
    _, state = CheckpointManager(lm_dir / "checkpoints").restore({"params": params})
    return state["params"], cfg


if __name__ == "__main__":
    main()
