"""Round-start Pallas/compiler boundary preflight (VERDICT r4 #7).

The remote TPU toolchain's multi-kernel composition boundary MOVES between
rounds (round 3 measured multi-layer Pallas-LSTM backward good at per-layer
T=800; round 4 saw T=502 compositions hard-crash the TPU worker while every
T=400 program passed the same day — BASELINE.md long-sequence notes). Probing
it ad hoc is expensive: a crash POISONS the worker for ~10-30 min. This script
makes the probing cheap and safe so caps (`ops/pallas/lstm_kernel.pallas_fits`
T cap, `ops/ctc._PALLAS_T_CAP`/`_PALLAS_T_CAP_FWD`, `apply_encoder
pallas_t_cap`) are set by measurement at round start, never raised on faith.

Safety protocol:
- every probe runs in a FRESH subprocess with a wall timeout;
- after any failure the runner health-checks the worker with a tiny matmul
  and WAITS (sleep + retry) until it recovers before the next probe;
- each family walks its T ladder upward and stops at the first failure
  (no point poisoning the worker twice for the same family).

Families (B=32, H=512, C=63/U=50 — the hard-corpus TIMIT shapes that found
the round-4 boundary):
  lstm      2-layer Pallas BLSTM encoder, value+grad (multi-kernel class)
  ctc       fused CTC loss+grad kernel, standalone
  ctc_fwd   forward-only CTC kernel (eval paths; probed separately per
            ADVICE r4 — it runs outside the fragile train composition)
  train     2xBLSTM + CTC + adam single train step, all-Pallas (the
            composition class the round-4 TIMIT rows crashed in)
  fit       short fit() of configs/timit_ctc_blstm.yml --profile hard at
            CURRENT caps (the actual round-4 crasher, unpatched)

Emits one JSON line: per-family max good T + recommended caps.

Usage:
  python benchmarks/compiler_boundary_probe.py               # full preflight
  python benchmarks/compiler_boundary_probe.py --families ctc_fwd --ts 400 800 1600 2400
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

HEALTH_SRC = """
import sys; sys.path.insert(0, {repo!r})
from tensorflow_end2end_speech_recognition_tpu.utils.jax_setup import setup
setup()
import jax.numpy as jnp
x = jnp.ones((256, 256))
assert float((x @ x).sum()) > 0
print("HEALTH_OK")
"""


def _probe_src(family: str, t: int) -> str:
    """Python source for one probe subprocess (prints PROBE_OK on success)."""
    return f"""
import sys; sys.path.insert(0, {str(REPO)!r})
from tensorflow_end2end_speech_recognition_tpu.utils.jax_setup import setup
setup()
import jax, jax.numpy as jnp, numpy as np, optax
family, T = {family!r}, {t}
B, H, D, C, U = 32, 512, 40, 63, 50

# lift the in-tree caps so the probe reaches the kernel at any T
from tensorflow_end2end_speech_recognition_tpu.ops.pallas import lstm_kernel
from tensorflow_end2end_speech_recognition_tpu.ops import ctc as ctc_ops
_fits = lstm_kernel.pallas_fits
lstm_kernel.pallas_fits = lambda b, h, t=None: b * h <= 4 * lstm_kernel._ANCHOR_ROWS and h <= 512
ctc_ops._PALLAS_T_CAP = 1 << 30
ctc_ops._PALLAS_T_CAP_FWD = 1 << 30

key = jax.random.PRNGKey(0)
if family in ("lstm", "train"):
    from tensorflow_end2end_speech_recognition_tpu.models.encoders import (
        EncoderConfig, apply_encoder, init_encoder)
    cfg = EncoderConfig(encoder_type="blstm", num_units=H, num_layers=2)
    params = init_encoder(key, cfg, D)
    xs = jax.random.normal(key, (B, T, D), jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)
    if family == "lstm":
        def loss_fn(p):
            return apply_encoder(p, cfg, xs, lens, pallas_t_cap=1 << 30).outputs.sum()
        v, g = jax.jit(jax.value_and_grad(loss_fn))(params)
        float(v); float(jax.tree_util.tree_leaves(g)[0].sum())
    else:  # train: encoder + head + Pallas CTC grad + adam, one jit
        from tensorflow_end2end_speech_recognition_tpu.ops.pallas.ctc_kernel import ctc_loss_pallas
        head = {{"w": jax.random.normal(key, (2 * H, C + 1)) * 0.05,
                 "b": jnp.zeros((C + 1,))}}
        labels = jax.random.randint(key, (B, U), 0, C)
        label_len = jnp.full((B,), U, jnp.int32)
        opt = optax.adam(1e-3)
        allp = {{"enc": params, "head": head}}
        opt_state = opt.init(allp)
        def loss_fn(p):
            out = apply_encoder(p["enc"], cfg, xs, lens, pallas_t_cap=1 << 30)
            logits = out.outputs @ p["head"]["w"] + p["head"]["b"]
            nll = ctc_loss_pallas(logits, out.lengths, labels, label_len, C)
            return nll.mean()
        @jax.jit
        def step(p, s):
            v, g = jax.value_and_grad(loss_fn)(p)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s, v
        allp, opt_state, v = step(allp, opt_state)
        float(v)
elif family in ("ctc", "ctc_fwd"):
    from tensorflow_end2end_speech_recognition_tpu.ops.pallas.ctc_kernel import (
        ctc_loss_pallas, ctc_loss_pallas_fwd_only)
    logits = jax.random.normal(key, (B, T, C + 1), jnp.float32)
    logit_len = jnp.full((B,), T, jnp.int32)
    labels = jax.random.randint(key, (B, U), 0, C)
    label_len = jnp.full((B,), U, jnp.int32)
    if family == "ctc":
        def loss_fn(lg):
            return ctc_loss_pallas(lg, logit_len, labels, label_len, C).mean()
        v, g = jax.jit(jax.value_and_grad(loss_fn))(logits)
        float(v); float(g.sum())
    else:
        v = jax.jit(lambda lg: ctc_loss_pallas_fwd_only(
            lg, logit_len, labels, label_len, C).mean())(logits)
        float(v)
elif family == "fit":
    # the round-4 crasher, at CURRENT in-tree caps (restore them first)
    lstm_kernel.pallas_fits = _fits
    ctc_ops._PALLAS_T_CAP = 400
    ctc_ops._PALLAS_T_CAP_FWD = 400
    import dataclasses
    from tensorflow_end2end_speech_recognition_tpu.train.loop import fit
    from tensorflow_end2end_speech_recognition_tpu.utils.config import ExperimentConfig
    exp = ExperimentConfig.from_yaml({str(REPO / "configs/timit_ctc_blstm.yml")!r})
    exp = dataclasses.replace(exp, num_epoch=3, toy_num_utts=256, toy_profile="hard")
    import shutil, tempfile
    mdir = tempfile.mkdtemp(prefix="boundary_fit_")
    try:
        fit(exp, mdir, print_fn=lambda *a: None)
    finally:
        shutil.rmtree(mdir, ignore_errors=True)
else:
    raise SystemExit(f"unknown family {{family}}")
print(f"PROBE_OK {{family}} {{T}}")
"""


def run_sub(src: str, timeout: int, tag: str):
    t0 = time.perf_counter()
    try:
        r = subprocess.run(
            [sys.executable, "-c", src], capture_output=True, text=True,
            timeout=timeout, cwd=REPO,
        )
        ok = r.returncode == 0 and ("PROBE_OK" in r.stdout or "HEALTH_OK" in r.stdout)
        detail = "" if ok else (r.stdout + r.stderr)[-800:]
    except subprocess.TimeoutExpired:
        ok, detail = False, f"timeout {timeout}s"
    dt = time.perf_counter() - t0
    print(f"  [{tag}] {'OK' if ok else 'FAIL'} ({dt:.0f}s)"
          + (f"\n    {detail.strip()[-400:]}" if detail else ""), flush=True)
    return ok, dt


def wait_healthy(max_tries: int = 20, sleep_s: int = 120) -> bool:
    src = HEALTH_SRC.format(repo=str(REPO))
    for i in range(max_tries):
        ok, _ = run_sub(src, 600, f"health {i}")
        if ok:
            return True
        print(f"  worker unhealthy; sleeping {sleep_s}s", flush=True)
        time.sleep(sleep_s)
    return False


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--families", nargs="*",
                    default=["fit", "lstm", "ctc", "train", "ctc_fwd"])
    ap.add_argument("--ts", type=int, nargs="*", default=[400, 448, 512])
    ap.add_argument("--ts-fwd", type=int, nargs="*", default=[400, 512, 800, 1600, 2400],
                    help="ladder for the standalone fwd-only kernel (eval shapes)")
    ap.add_argument("--timeout", type=int, default=1200)
    args = ap.parse_args()

    print("boundary preflight: initial health check", flush=True)
    if not wait_healthy():
        print(json.dumps({"error": "worker never became healthy"}))
        return 1

    results = {}
    for fam in args.families:
        ladder = [0] if fam == "fit" else (args.ts_fwd if fam == "ctc_fwd" else args.ts)
        max_good, failed_at = None, None
        for t in ladder:
            ok, _ = run_sub(_probe_src(fam, t), args.timeout, f"{fam} T={t}")
            if ok:
                max_good = t
            else:
                failed_at = t
                if not wait_healthy():
                    print(json.dumps({"error": f"worker poisoned after {fam} T={t}"}))
                    return 1
                break
        results[fam] = {"max_good_t": max_good, "failed_at": failed_at}

    rec = {
        "lstm_t_cap": (results.get("train", {}).get("max_good_t")
                       or results.get("lstm", {}).get("max_good_t") or 400),
        "ctc_t_cap": (results.get("train", {}).get("max_good_t")
                      or results.get("ctc", {}).get("max_good_t") or 400),
        "ctc_fwd_t_cap": results.get("ctc_fwd", {}).get("max_good_t") or 400,
        "fit_timit_hard": results.get("fit", {}).get("max_good_t") is not None
        if "fit" in results else None,
    }
    print(json.dumps({"families": results, "recommended_caps": rec}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
