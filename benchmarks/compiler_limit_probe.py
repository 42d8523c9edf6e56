"""Per-round remote-compiler-limit probe (VERDICT r2 #8).

Re-runs the known crash repro: a 2-layer pyramidal-BLSTM GRADIENT program
composing four bidirectional Pallas LSTM kernels at per-layer T=1198
(each kernel individually fine; the composition hard-crashed the remote
compile helper in round 2, which is why ``pallas_fits`` caps T at 800 and
``seq2seq`` applies ``pallas_t_cap=200``). If the remote toolchain ever
digests it, raise the caps and re-bench the long-sequence flagships.

Protocol (CLAUDE.md): tiny-matmul health check before AND after — a crash
poisons the worker for ~10 min, so run nothing else until the post-check
passes. Record one line in BASELINE.md per round: probe crash/pass @ commit.

Usage:  python benchmarks/compiler_limit_probe.py [T]   (default 1198)
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

from tensorflow_end2end_speech_recognition_tpu.ops.pallas.lstm_kernel import (  # noqa: E402
    lstm_bidi_pallas,
)

T = int(sys.argv[1]) if len(sys.argv) > 1 else 1198
B, D, H = 32, 120, 512


def health(tag):
    x = jnp.ones((256, 256))
    print(f"health[{tag}]: {float(jnp.sum(x @ x)):.0f}", flush=True)


def bidi_layer(p, xs):
    # same structure as rnn.bidirectional_scan's kernel path: shared input
    # projection per direction, backward direction time-flipped
    t = xs.shape[1]
    mask = jnp.ones((B, t), jnp.float32)
    xf = jnp.matmul(xs, p["wf"], preferred_element_type=jnp.float32) + p["bf"]
    xb = jnp.matmul(xs[:, ::-1], p["wb"], preferred_element_type=jnp.float32) + p["bb"]
    ys_f, ys_b = lstm_bidi_pallas(xf, xb, p["whf"], p["whb"], mask)
    return jnp.concatenate([ys_f, ys_b[:, ::-1]], axis=-1)


def loss_fn(params, xs):
    h1 = bidi_layer(params["l1"], xs)
    # pyramid: 2x time reduction by pairwise concat
    t2 = h1.shape[1] // 2
    h1 = h1[:, : t2 * 2].reshape(B, t2, -1)
    h2 = bidi_layer(params["l2"], h1)
    return jnp.sum(h2 * h2)


def layer_params(key, d):
    ks = jax.random.split(key, 4)
    mk = lambda k, fin: jax.random.normal(k, (fin, 4 * H)) * 0.05
    return {
        "wf": mk(ks[0], d), "wb": mk(ks[1], d),
        "bf": jnp.zeros((4 * H,)), "bb": jnp.zeros((4 * H,)),
        "whf": jax.random.normal(ks[2], (H, 4 * H)) * 0.05,
        "whb": jax.random.normal(ks[3], (H, 4 * H)) * 0.05,
    }


health("pre")
params = {
    "l1": layer_params(jax.random.PRNGKey(0), D),
    "l2": layer_params(jax.random.PRNGKey(1), 4 * H),
}
xs = jnp.asarray(np.random.RandomState(0).randn(B, T, D).astype(np.float32))

t0 = time.perf_counter()
try:
    g = jax.jit(jax.grad(loss_fn))(params, xs)
    s = float(sum(jnp.sum(jnp.abs(v)) for lv in g.values() for v in lv.values()))
    print(f"PASS: 2-layer pyramid bidi-Pallas grad at T={T} compiled+ran in "
          f"{time.perf_counter() - t0:.0f}s (|g|={s:.3e}) — consider raising "
          f"the pallas_fits T<=800 cap and seq2seq pallas_t_cap", flush=True)
except Exception as e:  # noqa: BLE001 — any remote failure is the result
    print(f"CRASH after {time.perf_counter() - t0:.0f}s: "
          f"{type(e).__name__}: {str(e)[:300]}", flush=True)
health("post")
