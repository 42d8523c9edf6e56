"""VERDICT r2 #7b: large-batch LSTM kernel time-block (kt) tuning sweep.

The kernels' kt block sizes are tuned at B=32 H=512 and scaled DOWN by
``_scale_kt`` as b*h grows; round 2 never measured whether a different kt
is better at B=64/128 — only that B>=64 saturates ~710 utts/s. This
sweeps kt for the bidirectional layer kernel (fwd and fwd+bwd) at a given
batch and reports ms per call, so the _scale_kt policy is either improved
or confirmed with numbers.

Safety: kt values whose scoped-VMEM footprint exceeds the B=32-anchored
budget can HARD-CRASH the remote compile helper (CLAUDE.md) — this sweep
only probes kt <= the current _scale_kt choice plus one step up, smallest
first, and health-checks between points.

Usage:  python benchmarks/lstm_kt_sweep.py [B] [T]   (default 64 400)
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

import tensorflow_end2end_speech_recognition_tpu.ops.pallas.lstm_kernel as lk  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
T = int(sys.argv[2]) if len(sys.argv) > 2 else 400
H, D = 512, 1024

rng = np.random.RandomState(0)
xf = jnp.asarray(rng.randn(B, T, 4 * H).astype(np.float32) * 0.05)
xb = jnp.asarray(rng.randn(B, T, 4 * H).astype(np.float32) * 0.05)
whf = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32) * 0.05)
whb = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32) * 0.05)
mask = jnp.ones((B, T), jnp.float32)


def health(tag):
    x = jnp.ones((256, 256))
    print(f"  health[{tag}]: {float(jnp.sum(x @ x)):.0f}", flush=True)


def measure(n=20):
    fwd = jax.jit(lambda a, b, c, d, m: jnp.sum(
        lk.lstm_bidi_pallas(a, b, c, d, m)[0]))
    # grad wrt all inputs through the custom VJP
    g = jax.jit(lambda a, b, c, d, m: sum(
        jnp.sum(jnp.abs(v))
        for v in jax.grad(
            lambda a_, b_, c_, d_: (lambda yf, yb: jnp.sum(yf * yf)
                                    + jnp.sum(yb * yb))(
                *lk.lstm_bidi_pallas(a_, b_, c_, d_, m)),
            argnums=(0, 1, 2, 3))(a, b, c, d)
    ))
    float(fwd(xf, xb, whf, whb, mask)); float(g(xf, xb, whf, whb, mask))
    t0 = time.perf_counter()
    for _ in range(n):
        s = fwd(xf, xb, whf, whb, mask)
    float(s)
    f_ms = (time.perf_counter() - t0) / n * 1e3
    t0 = time.perf_counter()
    for _ in range(n):
        s = g(xf, xb, whf, whb, mask)
    float(s)
    fb_ms = (time.perf_counter() - t0) / n * 1e3
    return f_ms, fb_ms


cur_f = lk._scale_kt(lk._BLOCK_T_BIDI, T, B, H)
cur_b = lk._scale_kt(lk._BLOCK_T_BIDI_BWD, T, B, H)
print(f"B={B} T={T} H={H}: current kt fwd={cur_f} bwd={cur_b}", flush=True)
health("pre")

orig = (lk._scale_kt, lk._BLOCK_T_BIDI, lk._BLOCK_T_BIDI_BWD)
results = []
# smallest-first; one step above the current choice is the riskiest point
for ktf, ktb in sorted({(max(1, cur_f // 2), max(1, cur_b // 2)),
                        (cur_f, cur_b),
                        (cur_f, max(1, cur_b // 2)),
                        (min(2 * cur_f, T), cur_b)}):
    # pin kt exactly: bypass _scale_kt's anchor scaling, set the constants
    lk._scale_kt = lambda base, t, b, h: max(1, min(base, t))
    lk._BLOCK_T_BIDI, lk._BLOCK_T_BIDI_BWD = ktf, ktb
    try:
        f_ms, fb_ms = measure()
        print(f"kt=({ktf},{ktb}): fwd {f_ms:7.2f} ms  fwd+bwd {fb_ms:7.2f} ms",
              flush=True)
        results.append((ktf, ktb, f_ms, fb_ms))
    except Exception as e:  # noqa: BLE001
        print(f"kt=({ktf},{ktb}): FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
    finally:
        lk._scale_kt, lk._BLOCK_T_BIDI, lk._BLOCK_T_BIDI_BWD = orig
    health(f"post kt=({ktf},{ktb})")

if results:
    best = min(results, key=lambda r: r[3])
    print(f"best fwd+bwd: kt=({best[0]},{best[1]}) {best[3]:.2f} ms "
          f"(current ({cur_f},{cur_b}))", flush=True)
