"""RNN-T train-step throughput at production shapes, plus decode RTF.

Full train step (waveform frontend + causal 4xLSTM-512 encoder + LSTM-512
prediction net + joint-512 + associative-scan lattice loss + adam) on
B=32 x 12 s utterances, 3/3 stacking (T'=400), U=40 char labels — the
``configs/ls_transducer.yml`` architecture at the headline bench's shapes.

Usage: python benchmarks/transducer_step.py [batch] [seconds] [u]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tensorflow_end2end_speech_recognition_tpu.utils.jax_setup import setup  # noqa: E402

setup()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tensorflow_end2end_speech_recognition_tpu.frontend import FrontendConfig  # noqa: E402
from tensorflow_end2end_speech_recognition_tpu.models.encoders import EncoderConfig  # noqa: E402
from tensorflow_end2end_speech_recognition_tpu.models.transducer import (  # noqa: E402
    TransducerConfig,
    encode,
)
from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer  # noqa: E402
from tensorflow_end2end_speech_recognition_tpu.train.transducer_task import (  # noqa: E402
    TransducerTaskConfig,
    init_params,
    make_train_step,
)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    u = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    sr = 16000
    num_classes = 28

    task = TransducerTaskConfig(
        model=TransducerConfig(
            encoder=EncoderConfig(encoder_type="lstm", num_units=512, num_layers=4),
            num_classes=num_classes,
            pred_num_units=512, embedding_dim=128, joint_dim=512,
        ),
        frontend=FrontendConfig(use_energy=False, add_deltas=False, cmvn="none"),
        num_stack=3, num_skip=3,
    )
    rng = np.random.RandomState(0)
    jbatch = {
        "inputs": jnp.asarray(rng.randn(batch, seconds * sr).astype(np.float32) * 0.1),
        "input_len": jnp.full((batch,), seconds * sr, jnp.int32),
        "labels": jnp.asarray(rng.randint(0, num_classes, (batch, u)).astype(np.int32)),
        "label_len": jnp.full((batch,), u, jnp.int32),
    }
    params = init_params(jax.random.PRNGKey(0), task)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    opt = build_optimizer("adam", clip_grad_norm=5.0)
    opt_state = opt.init(params)
    step = make_train_step(task, opt)
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    params, opt_state, aux = step(params, opt_state, jbatch, 1e-3, key)
    print(f"params {n_params / 1e6:.1f}M  compile+first {time.perf_counter() - t0:.1f}s "
          f"loss {float(aux['loss']):.2f}")
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        key, sub = jax.random.split(key)
        params, opt_state, aux = step(params, opt_state, jbatch, 1e-3, sub)
    float(aux["loss"])  # sync (block_until_ready lies on this backend)
    dt = (time.perf_counter() - t0) / n
    print(f"[transducer train B={batch} {seconds}s U={u}] steady "
          f"{dt * 1e3:.1f} ms/step = {batch / dt:.1f} utts/s/chip")

    # greedy decode RTF
    from tensorflow_end2end_speech_recognition_tpu.decoding.transducer_greedy import (
        transducer_greedy_decode,
    )
    from tensorflow_end2end_speech_recognition_tpu.train.ctc_task import device_pipeline

    @jax.jit
    def dec(params, b):
        feats, fl = device_pipeline(task, b)
        out = encode(params, task.model, feats, fl)
        return transducer_greedy_decode(params, task.model, out.f_proj, out.enc_len)

    d, dl = dec(params, jbatch)
    float(jnp.sum(dl))
    t0 = time.perf_counter()
    for _ in range(5):
        d, dl = dec(params, jbatch)
    float(jnp.sum(dl))
    dt = (time.perf_counter() - t0) / 5
    audio_s = batch * seconds
    print(f"[transducer greedy decode] {dt * 1e3:.1f} ms/batch  "
          f"RTF {dt / audio_s:.2e} ({audio_s / dt:.0f}x realtime/chip)")


if __name__ == "__main__":
    main()
