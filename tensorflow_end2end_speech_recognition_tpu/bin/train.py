"""Training entry point.

Reference parity: ``experiments/<corpus>/training/train_{ctc,attention}.py``
took a YAML config path and a model save root (SURVEY.md §3.1). Usage:

    python -m tensorflow_end2end_speech_recognition_tpu.bin.train \
        configs/timit_ctc_blstm.yml /tmp/model_dir [--epochs N]
"""

from __future__ import annotations

import argparse

from ..utils.jax_setup import setup as _jax_setup

from ..train.loop import fit
from ..utils.config import ExperimentConfig


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="YAML experiment config (reference key names accepted)")
    ap.add_argument("model_dir", help="directory for checkpoints/logs/config copy")
    ap.add_argument("--epochs", type=int, default=None, help="override num_epoch")
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax.profiler trace of steps 2-5 into the model dir")
    args = ap.parse_args(argv)
    _jax_setup()

    import sys
    from pathlib import Path

    Path(args.model_dir).mkdir(parents=True, exist_ok=True)
    log_f = open(Path(args.model_dir) / "train.log", "a")

    _orig = sys.stdout

    class _Tee:
        def write(self, s):
            _orig.write(s)
            log_f.write(s)
        def flush(self):
            _orig.flush()
            log_f.flush()

    sys.stdout = _Tee()  # reference parity: train output also lands in train.log
    try:
        exp = ExperimentConfig.from_yaml(args.config)
        if args.epochs is not None:
            import dataclasses

            exp = dataclasses.replace(exp, num_epoch=args.epochs)
        summary = fit(exp, args.model_dir, profile_steps=(2, 5) if args.profile else None)
        print("FINAL", summary)
    finally:
        sys.stdout = _orig
        log_f.close()


if __name__ == "__main__":
    main()
