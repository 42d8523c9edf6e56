"""Production-shape train-step throughput for the joint BPE flagship.

Builds the task straight from ``configs/ls960_joint_bpe.yml`` (BPE-1k-ish
units, num_stack 3/3, 4x pyramid), feeds synthetic 12 s waveform batches
with U=60 subword labels (~5 BPE units/s of real speech), and times the
full jitted train step (frontend + encoder + joint loss + grads + adam).
This is the config the round-2 verdict asked to ship (VERDICT r2 #2): the
stacked path the char-unit config cannot take (200 char labels exceed the
stacked+pyramid T', so ls960_joint.yml rides the T=1198 all-scan at 266
utts/s; coarse units make stacking label-feasible).

Usage:  python benchmarks/joint_bpe_step.py [vocab]
(``vocab`` overrides the unit-inventory size; the toy corpus only learns
~58 BPE units, pass 1000 to cost a real bpe_1000 softmax/embedding.)
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

from tensorflow_end2end_speech_recognition_tpu.data.toy_corpus import ToyCorpus  # noqa: E402
from tensorflow_end2end_speech_recognition_tpu.train.loop import build_task  # noqa: E402
from tensorflow_end2end_speech_recognition_tpu.train.optimizer import build_optimizer  # noqa: E402
from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig  # noqa: E402

B, SECONDS, SR, U = 32, 12, 16000, 60

exp = ExperimentConfig.from_yaml(REPO / "configs" / "ls960_joint_bpe.yml")
# the toy corpus learns the config's BPE inventory; only the tokenizer is used
tok = ToyCorpus(label_type=exp.label_type, num_utts=4).tokenizer
if len(sys.argv) > 1:  # cost a realistic inventory (toy BPE tops out ~58)
    class _Vocab:
        num_units = int(sys.argv[1])
    tok = _Vocab()
task, task_mod = build_task(exp, tok)
print(f"units={tok.num_units} stack={task.num_stack} "
      f"enc={task.model.encoder.encoder_type}x{task.model.encoder.num_layers}",
      flush=True)

rng = np.random.RandomState(0)
batch = {
    "inputs": jnp.asarray(rng.randn(B, SECONDS * SR).astype(np.float32) * 0.1),
    "input_len": jnp.full((B,), SECONDS * SR, jnp.int32),
    "labels": jnp.asarray(rng.randint(0, tok.num_units, (B, U)), jnp.int32),
    "label_len": jnp.full((B,), U, jnp.int32),
}
params = task_mod.init_params(jax.random.PRNGKey(0), task)
opt = build_optimizer(exp.optimizer, clip_grad_norm=exp.clip_grad_norm)
opt_state = opt.init(params)
step = task_mod.make_train_step(task, opt)
key = jax.random.PRNGKey(1)

t0 = time.perf_counter()
params, opt_state, aux = step(params, opt_state, batch, 1e-3, key, 0)
loss = float(aux["loss"])
print(f"compile+step1 {time.perf_counter() - t0:.1f}s loss={loss:.3f} "
      f"nonfinite={bool(aux['nonfinite'])}", flush=True)
assert loss < 1e20, "CTC infeasible at these shapes (clamped loss)"

N = 10
t0 = time.perf_counter()
for i in range(N):
    key, sub = jax.random.split(key)
    params, opt_state, aux = step(params, opt_state, batch, 1e-3, sub, i + 1)
loss = float(aux["loss"])
dt = (time.perf_counter() - t0) / N
print(f"steady {dt * 1e3:.1f} ms/step = {B / dt:.1f} utts/s/chip "
      f"loss={loss:.3f}", flush=True)
