"""Re-measure batched decode RTF on a saved model dir (current code).

Used for A/Bing decode-path changes (e.g. the while_loop early exit in
``decoding/attention_beam.py`` / ``models/seq2seq.py``) against the RTF a
prior ``config_sweep.py`` row recorded for the SAME checkpoint: same
protocol (test split, batched end-to-end features->text, 3-run mean), only
the code under the jit differs.

Usage: python benchmarks/attention_rtf_probe.py MODEL_DIR [MODEL_DIR...]
"""
from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tensorflow_end2end_speech_recognition_tpu.utils.jax_setup import setup  # noqa: E402


def main():
    setup()
    import jax

    from benchmarks.config_sweep import measure_rtf
    from tensorflow_end2end_speech_recognition_tpu.train.checkpoint import (
        CheckpointManager,
    )
    from tensorflow_end2end_speech_recognition_tpu.train.loop import (
        build_corpus_splits,
        build_task,
        feature_dim_of,
    )
    from tensorflow_end2end_speech_recognition_tpu.utils.config import (
        ExperimentConfig,
    )

    for mdir in map(Path, sys.argv[1:]):
        exp = ExperimentConfig.from_yaml(mdir / "config.yml")
        _, dev_utts, test_utts, tokenizer = build_corpus_splits(exp)
        task, task_mod = build_task(exp, tokenizer, feature_dim_of(dev_utts))
        params = task_mod.init_params(jax.random.PRNGKey(exp.seed), task)
        _, state = CheckpointManager(mdir / "checkpoints").restore({"params": params})
        rtf = measure_rtf(exp, task, task_mod, state["params"], test_utts, tokenizer)
        print(json.dumps({
            "model_dir": str(mdir),
            "model": f"{exp.model_type}/{exp.encoder_type}",
            "beam": max(exp.beam_width, 1),
            "decode_rtf": f"{rtf:.2e}",
        }), flush=True)


if __name__ == "__main__":
    main()
