"""Model export for deployment: frozen inference graphs as StableHLO.

The reference had no serving story (decode ran inside the research scripts
via ``sess.run`` — SURVEY.md §1 "no serving layer"). For production serving
this module freezes a trained model into a self-contained, ahead-of-time
exportable artifact via ``jax.export``:

- the full inference pipeline (waveform/feature batch -> frontend -> encoder
  -> greedy or prefix-beam decode) is staged as ONE StableHLO program with
  the checkpoint weights baked in as constants (the TF "frozen graph"
  equivalent), so a serving process needs no Python model code, no
  checkpoint restore, and no tracing — just the JAX/XLA runtime;
- shapes are static (batch x padded samples), matching the bucketed batch
  contract the framework trains with;
- ``platforms`` selects the lowering targets (e.g. ``["tpu", "cpu"]``) so
  one artifact can serve on TPU workers and fall back to CPU canaries.

CLI: ``python -m tensorflow_end2end_speech_recognition_tpu.bin.export``.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def build_inference_fn(task, task_mod, params, beam_width: int = 1,
                       lm=None, lm_weight: float = 0.0):
    """(inputs, input_len) -> (decoded ids [B, T'], lengths [B]).

    ``params`` are closed over: ``jax.export`` stages them into the artifact
    as constants. CTC models decode greedy or prefix-beam; attention models
    decode greedy (or beam via ``attention_beam_search``). ``lm`` =
    ``(lm_params, LMConfig)`` stages RNN-LM shallow fusion into the beam
    (carried per-slot state; the LM weights freeze into the artifact too).
    No loss is staged — the graph is inference-only.
    """
    from .train.ctc_task import CTCTaskConfig, device_pipeline

    if isinstance(task, CTCTaskConfig):
        from .decoding import ctc_greedy_decode, ctc_prefix_beam_search
        from .models.ctc import apply_ctc

        fusion_lm = None
        if lm is not None and lm_weight and beam_width > 1:
            from .models.lm import make_fusion_lm

            lm_params, lm_cfg = lm
            fusion_lm = make_fusion_lm(
                lm_params, lm_cfg, sos_id=lm_cfg.vocab - 2,
                num_ctc_classes=task.model.vocab_with_blank,
            )

        def infer(inputs, input_len):
            feats, fl = device_pipeline(task, {"inputs": inputs, "input_len": input_len})
            out = apply_ctc(params, task.model, feats, fl)
            if beam_width > 1:
                p, l, _ = ctc_prefix_beam_search(
                    out.logits, out.logit_len, task.model.blank_id,
                    beam_width=beam_width, fusion_lm=fusion_lm,
                    lm_weight=lm_weight,
                )
                return p[:, 0], l[:, 0]
            return ctc_greedy_decode(out.logits, out.logit_len, task.model.blank_id)

        return infer

    from .train.transducer_task import TransducerTaskConfig

    if isinstance(task, TransducerTaskConfig):
        from .decoding.transducer_greedy import transducer_greedy_decode
        from .models.transducer import encode

        t_fusion = None
        if lm is not None and lm_weight and beam_width > 1:
            from .models.lm import make_fusion_lm

            lm_params, lm_cfg = lm
            t_fusion = make_fusion_lm(
                lm_params, lm_cfg, sos_id=lm_cfg.vocab - 2,
                num_ctc_classes=task.model.vocab_with_blank,
            )

        def infer(inputs, input_len):
            feats, fl = device_pipeline(task, {"inputs": inputs, "input_len": input_len})
            out = encode(params, task.model, feats, fl)
            if beam_width > 1:
                from .decoding.transducer_beam import transducer_beam_search

                res = transducer_beam_search(
                    params, task.model, out.f_proj, out.enc_len,
                    beam_width=beam_width,
                    fusion_lm=t_fusion,
                    lm_weight=lm_weight if t_fusion is not None else 0.0,
                )
                return res.tokens[:, 0], res.lengths[:, 0]
            return transducer_greedy_decode(params, task.model, out.f_proj, out.enc_len)

        return infer

    from .decoding import attention_beam_search
    from .models.seq2seq import greedy_decode

    def infer(inputs, input_len):
        feats, fl = device_pipeline(task, {"inputs": inputs, "input_len": input_len})
        cfg = task.model
        if beam_width > 1:
            kwargs = {}
            if lm is not None and lm_weight:
                kwargs = {"lm_params": lm[0], "lm_cfg": lm[1],
                          "lm_weight": lm_weight}
            res = attention_beam_search(params, cfg, feats, fl,
                                        beam_width=beam_width, **kwargs)
            return res.tokens[:, 0], res.lengths[:, 0]
        out = greedy_decode(params, cfg, feats, fl)
        preds = out.predicted_ids
        seen = jnp.cumsum(preds == cfg.eos_id, axis=1) > 0
        return jnp.where(seen, -1, preds), jnp.sum(~seen, axis=1)

    return infer


def export_model(
    task,
    task_mod,
    params,
    out_path: str | Path,
    batch_size: int,
    num_samples: int,
    beam_width: int = 1,
    tokenizer=None,
    platforms: tuple | None = None,
    extra_meta: dict | None = None,
    lm=None,
    lm_weight: float = 0.0,
) -> Path:
    """Freeze + serialize the inference graph; returns the artifact path.

    ``num_samples``: padded waveform samples (frontend mode) or padded
    frames (precomputed-feature mode, where inputs are [B, T, D]).
    Writes ``<out>.json`` next to the artifact with the serving contract
    (shapes, units, blank id) so clients can decode without the framework.
    ``lm=(lm_params, LMConfig)`` + ``lm_weight`` bake shallow fusion into
    the beam-decode graph.
    """
    infer = build_inference_fn(task, task_mod, params, beam_width, lm, lm_weight)
    if task.frontend is not None:
        in_spec = jax.ShapeDtypeStruct((batch_size, num_samples), jnp.float32)
    else:
        in_spec = jax.ShapeDtypeStruct(
            (batch_size, num_samples, task.feature_dim), jnp.float32
        )
    len_spec = jax.ShapeDtypeStruct((batch_size,), jnp.int32)
    kwargs = {"platforms": platforms} if platforms else {}
    exported = jax_export.export(jax.jit(infer), **kwargs)(in_spec, len_spec)
    out_path = Path(out_path)
    out_path.write_bytes(exported.serialize())
    meta = {
        "batch_size": batch_size,
        "num_samples": num_samples,
        "input_rank": len(in_spec.shape),
        "feature_dim": None if task.frontend is not None else task.feature_dim,
        "beam_width": beam_width,
        "lm_weight": lm_weight if lm is not None else 0.0,
        "platforms": list(exported.platforms),
        "blank_id": getattr(task.model, "blank_id", None),
        "units": list(getattr(tokenizer, "units", [])) if tokenizer else None,
        **(extra_meta or {}),
    }
    out_path.with_suffix(out_path.suffix + ".json").write_text(
        json.dumps(meta, indent=2)
    )
    return out_path


def load_exported(path: str | Path):
    """Deserialize an exported artifact; returns ``fn(inputs, input_len)``.

    The returned callable runs the frozen program (weights included) on the
    current backend — no model code or checkpoint needed.
    """
    exported = jax_export.deserialize(Path(path).read_bytes())
    # jit the call so the frozen program is compiled ONCE and then dispatched
    # from cache; a bare exported.call re-stages per invocation (measured
    # 71 ms vs 13 ms per batch on the flagship greedy graph)
    call = jax.jit(exported.call)

    def infer(inputs, input_len):
        # returns device arrays so a server can pipeline batches without a
        # per-call device->host sync; np.asarray() the results to fetch
        return call(
            jnp.asarray(inputs, jnp.float32), jnp.asarray(input_len, jnp.int32)
        )

    return infer


def export_streaming_model(
    task,
    params,
    out_path: str | Path,
    batch_size: int,
    chunk_samples: int,
    tokenizer=None,
    platforms: tuple | None = None,
    extra_meta: dict | None = None,
    beam_width: int = 1,
    top_k_classes: int = 16,
    max_prefix_len: int = 200,
    lm=None,
    lm_weight: float = 0.0,
) -> Path:
    """Freeze the streaming chunk step (``streaming.build_streaming_fn``).

    The stream state is flattened to a leaf list so a loader can rebuild the
    zero initial state from the ``.json`` contract alone (no model code, no
    pytree definition): the artifact's program is
    ``(state_leaves, chunk [B, C], chunk_len [B]) ->
    (state_leaves', tokens [B, F], tok_len [B])``.

    ``beam_width > 1`` freezes the carried-prefix-beam step instead (VERDICT
    r2 #3): the chunk step advances the beam across chunks while still
    emitting greedy partials live, and a SECOND frozen program — written to
    ``<out>.final`` — maps the state leaves to the final beam result
    ``(prefixes [B, W, L], lengths [B, W], scores [B, W])``, to be invoked
    once at stream end. Frame-stacked tasks set ``"final_flush": true`` in
    the contract: the driver must send ``chunk_len = -1`` at an
    exact-chunk-boundary stream end (``streaming.py`` docstring).

    ``lm`` = (lm_params, LMConfig) + ``lm_weight`` bake RNN-LM shallow
    fusion into the frozen beam step (the LM weights become artifact
    constants, its per-slot state extra ``state_leaves`` — the contract
    mechanism carries it with no loader changes).
    """
    from .streaming import build_streaming_fn

    fns = build_streaming_fn(
        task, params, chunk_samples, beam_width=beam_width,
        top_k_classes=top_k_classes, max_prefix_len=max_prefix_len,
        lm=lm, lm_weight=lm_weight,
    )
    init_fn, step_fn = fns[0], fns[1]
    state0 = init_fn(batch_size)
    leaves0, treedef = jax.tree.flatten(state0)

    def flat_step(leaves, chunk, chunk_len):
        state = jax.tree.unflatten(treedef, leaves)
        state, tokens, n = step_fn(state, chunk, chunk_len)
        return jax.tree.leaves(state), tokens, n

    specs = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in leaves0]
    chunk_spec = jax.ShapeDtypeStruct((batch_size, chunk_samples), jnp.float32)
    len_spec = jax.ShapeDtypeStruct((batch_size,), jnp.int32)
    kwargs = {"platforms": platforms} if platforms else {}
    exported = jax_export.export(jax.jit(flat_step), **kwargs)(
        specs, chunk_spec, len_spec
    )
    out_path = Path(out_path)
    out_path.write_bytes(exported.serialize())
    if beam_width > 1:
        finalize_fn = fns[2]

        def flat_finalize(leaves):
            # plain tuple: jax.export cannot serialize the decoder's
            # namedtuple result types (e.g. TransducerBeamResult)
            return tuple(finalize_fn(jax.tree.unflatten(treedef, leaves)))

        exported_final = jax_export.export(jax.jit(flat_finalize), **kwargs)(specs)
        out_path.with_suffix(out_path.suffix + ".final").write_bytes(
            exported_final.serialize()
        )
    stacked = task.num_stack > 1 or task.num_skip > 1
    base_frames = chunk_samples // task.frontend.frame_step
    enc_frames = (  # encoder frames per step (streaming.py f_s)
        (task.num_stack - 1 + base_frames) // task.num_skip + 1
        if stacked else base_frames
    )
    # transducer steps emit up to max_symbols_per_frame tokens per frame
    sym = getattr(task.model, "max_symbols_per_frame", 1)
    meta = {
        "streaming": True,
        "batch_size": batch_size,
        "chunk_samples": chunk_samples,
        "frames_per_chunk": enc_frames * sym,  # token-output width per step
        "beam_width": beam_width,
        "final_flush": stacked,
        "state_leaves": [
            {"shape": list(x.shape), "dtype": str(x.dtype)} for x in leaves0
        ],
        # constant-filled non-zero initial leaves (frame_base starts negative
        # — the zero-carry preamble; prev_id starts at -1), by leaf index
        "state_init": {
            str(i): float(np.asarray(x).ravel()[0])
            for i, x in enumerate(leaves0)
            if x.size
            and float(np.asarray(x).ravel()[0]) != 0.0
            and bool((np.asarray(x) == np.asarray(x).ravel()[0]).all())
        },
        "platforms": list(exported.platforms),
        "blank_id": task.model.blank_id,
        "units": list(getattr(tokenizer, "units", [])) if tokenizer else None,
        **(extra_meta or {}),
    }
    out_path.with_suffix(out_path.suffix + ".json").write_text(
        json.dumps(meta, indent=2)
    )
    # leaves the .json constant mechanism above can't rebuild — non-uniform
    # values like the beam state's per-slot sentinel hashes and its
    # one-live-slot pb row — ship as an exact sidecar (loader prefers it)
    def _const_ok(x):
        a = np.asarray(x)
        return a.size == 0 or bool((a == a.ravel()[0]).all())

    if not all(_const_ok(x) for x in leaves0):
        np.savez(
            out_path.with_suffix(out_path.suffix + ".state0.npz"),
            **{str(i): np.asarray(x) for i, x in enumerate(leaves0)},
        )
    return out_path


def load_streaming(path: str | Path):
    """Load a streaming artifact; returns ``(state0_leaves, step_fn, finalize)``.

    ``step_fn(state_leaves, chunk, chunk_len)`` returns
    ``(state_leaves', tokens, tok_len)``; thread the leaves through calls.
    The zero initial state is rebuilt from the ``.json`` contract.
    ``finalize`` is None for greedy artifacts; for beam artifacts
    (``beam_width > 1`` at export) it is ``finalize(state_leaves) ->
    (prefixes [B, W, L], lengths [B, W], scores [B, W])``, loaded from the
    sibling ``<path>.final`` program.
    """
    path = Path(path)
    meta = json.loads(path.with_suffix(path.suffix + ".json").read_text())
    if not meta.get("streaming"):
        raise ValueError(f"{path} is not a streaming artifact")
    exported = jax_export.deserialize(path.read_bytes())
    call = jax.jit(exported.call)
    state0_path = path.with_suffix(path.suffix + ".state0.npz")
    if state0_path.exists():
        # non-constant initial leaves (the beam state's per-slot sentinel
        # hashes and one-live-slot pb row) can't be rebuilt from the .json
        # contract alone — load the exact exported initial state
        with np.load(state0_path) as z:
            state0 = [jnp.asarray(z[str(i)]) for i in range(len(meta["state_leaves"]))]
    else:
        state0 = [jnp.zeros(s["shape"], s["dtype"]) for s in meta["state_leaves"]]
        for i, v in meta.get("state_init", {}).items():
            s = meta["state_leaves"][int(i)]
            state0[int(i)] = jnp.full(s["shape"], v, s["dtype"])

    def step(state_leaves, chunk, chunk_len):
        return call(
            state_leaves,
            jnp.asarray(chunk, jnp.float32),
            jnp.asarray(chunk_len, jnp.int32),
        )

    finalize = None
    final_path = path.with_suffix(path.suffix + ".final")
    if meta.get("beam_width", 1) > 1 and final_path.exists():
        final_call = jax.jit(jax_export.deserialize(final_path.read_bytes()).call)

        def finalize(state_leaves):  # noqa: F811 — the beam variant
            return final_call(state_leaves)

    return state0, step, finalize


class StreamingEngine:
    """Multiplex independent live audio sessions over a streaming program.

    The streaming step advances all ``B`` batch rows at once; rows with
    ``chunk_len == 0`` freeze bit-exactly (``streaming.py``), so each row is
    a *slot* an independent session can own. Sessions buffer audio host-side;
    a single worker thread dispatches one device step whenever any slot has
    a full chunk buffered (or is flushing its final partial chunk), with all
    device work serialized on that thread.

    ``step`` is either the in-process jitted step or a frozen artifact's
    (``load_streaming``); both take/return flat state leaves. Every leaf has
    a leading batch dim, so slot reset is a row-select against the initial
    state.
    """

    def __init__(self, state0_leaves, step, batch_size: int, chunk_samples: int,
                 tick_ms: float = 5.0, session_timeout_s: float = 300.0,
                 finalize=None, final_flush: bool = False):
        self._state0 = [jnp.asarray(x) for x in state0_leaves]
        self._state = list(self._state0)
        self._step = step
        self._b = batch_size
        self._chunk = chunk_samples
        self._tick = tick_ms / 1e3
        self._session_timeout = session_timeout_s
        # beam artifacts: finalize(state) -> (prefixes, lengths, scores);
        # end() then returns the stream's FINAL beam transcript (the live
        # per-chunk tokens remain greedy partials, revisable until the end)
        self._finalize = finalize
        # stacked streams need the explicit chunk_len=-1 end-of-stream flush
        # when they end on an exact chunk boundary (streaming.py docstring)
        self._final_flush = final_flush
        self._lock = threading.Lock()
        self._slots = [None] * batch_size  # session dicts (or None)
        self._sessions: dict[str, int] = {}
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- session API (thread-safe) ------------------------------------------

    def start(self) -> str | None:
        """Allocate a slot; returns a session id or None if all are busy."""
        import uuid

        with self._lock:
            for i, s in enumerate(self._slots):
                if s is None:
                    sid = uuid.uuid4().hex[:12]
                    self._slots[i] = {
                        "id": sid, "buf": np.zeros((0,), np.float32),
                        "pending": [], "ending": False, "reset": True,
                        "flushed": threading.Event(), "last": time.monotonic(),
                    }
                    self._sessions[sid] = i
                    return sid
        return None

    def feed(self, sid: str, samples: np.ndarray) -> list:
        """Append audio; returns tokens emitted since the last call."""
        samples = np.asarray(samples, np.float32).ravel()
        with self._lock:
            slot = self._slots[self._sessions[sid]]
            if slot.get("error") is not None:
                raise slot["error"]
            if slot["ending"]:
                raise ValueError("session already ended")
            slot["buf"] = np.concatenate([slot["buf"], samples])
            slot["last"] = time.monotonic()
            out, slot["pending"] = slot["pending"], []
        return out

    def end(self, sid: str, timeout: float = 60.0) -> list:
        """Flush remaining audio; returns the final tokens and frees the slot.

        Greedy engines return the tokens emitted since the last ``feed``;
        beam engines (``finalize`` set) return the stream's COMPLETE final
        beam transcript, superseding all greedy partials delivered live.
        """
        with self._lock:
            i = self._sessions[sid]
            slot = self._slots[i]
            slot["ending"] = True
            ev = slot["flushed"]
        if not ev.wait(timeout):
            # free the slot anyway: a hung device step must not leak the
            # slot forever (ending slots skip idle reclaim — ADVICE r2 #1)
            with self._lock:
                if self._sessions.get(sid) == i:
                    self._slots[i] = None
                    del self._sessions[sid]
            raise TimeoutError("stream flush timed out")
        with self._lock:
            out = slot["pending"]
            if self._finalize is not None and slot.get("final") is not None:
                out = slot["final"]
            err = slot.get("error")
            self._slots[i] = None
            del self._sessions[sid]
        if err is not None:
            raise err
        return out

    def stop(self):
        self._stop.set()
        self._worker.join(timeout=5.0)

    # -- worker --------------------------------------------------------------

    def _run(self):
        c = self._chunk
        while not self._stop.is_set():
            with self._lock:
                # reclaim slots abandoned without end(): a disconnected client
                # must not leak its slot forever (batch_size leaks = total DoS)
                now = time.monotonic()
                for i, s in enumerate(self._slots):
                    # ending slots are reclaimed too: if end()'s waiter is
                    # gone (timeout/disconnect) a flush that never completes
                    # would otherwise pin the slot forever (ADVICE r2 #1)
                    if s is not None and now - s["last"] > self._session_timeout:
                        del self._sessions[s["id"]]
                        self._slots[i] = None
                resets = [i for i, s in enumerate(self._slots) if s and s["reset"]]
                work = []
                for i, s in enumerate(self._slots):
                    if s is None or s["reset"]:
                        continue
                    if len(s["buf"]) >= c:
                        work.append((i, s["buf"][:c], c))
                        s["buf"] = s["buf"][c:]
                    elif s["ending"] and not s["flushed"].is_set():
                        n = len(s["buf"])
                        # stacked stream ending on an exact chunk boundary:
                        # chunk_len=-1 tells the step to flush tail windows
                        work.append((i, s["buf"], -1 if n == 0 and self._final_flush else n))
                        s["buf"] = np.zeros((0,), np.float32)
                if resets:
                    for i in resets:
                        self._slots[i]["reset"] = False
            if resets:
                mask = np.zeros((self._b,), bool)
                mask[resets] = True
                jmask = jnp.asarray(mask)
                self._state = [
                    jnp.where(jmask.reshape((-1,) + (1,) * (o.ndim - 1)), f, o)
                    for f, o in zip(self._state0, self._state)
                ]
            if not work:
                time.sleep(self._tick)
                continue
            chunk = np.zeros((self._b, c), np.float32)
            lens = np.zeros((self._b,), np.int32)
            for i, data, n in work:
                chunk[i, : len(data)] = data
                lens[i] = n
            try:
                state, toks, nn = self._step(self._state, chunk, lens)
                self._state = list(state)
                toks, nn = np.asarray(toks), np.asarray(nn)
            except Exception as e:  # device error: fail the sessions, stay up
                with self._lock:
                    for i, _, _ in work:
                        s = self._slots[i]
                        if s is not None:
                            s["error"] = e
                            s["flushed"].set()
                continue
            newly_flushed = []
            with self._lock:
                for i, _, n in work:
                    s = self._slots[i]
                    if s is None:
                        continue
                    s["pending"].extend(int(t) for t in toks[i, : nn[i]])
                    done = False
                    if n < c and s["ending"]:
                        done = True
                    elif (s["ending"] and len(s["buf"]) == 0 and n == c
                          and not self._final_flush):
                        # ended exactly on a chunk boundary: nothing to flush
                        # (final_flush artifacts instead get a -1 step next
                        # tick to emit their held-back stacked tail windows)
                        done = True
                    if done:
                        if self._finalize is None:
                            s["flushed"].set()
                        else:
                            newly_flushed.append(i)
            if newly_flushed:
                # beam artifact: one finalize call maps the carried beam
                # state to the finished streams' final transcripts (still on
                # this worker thread — all device work stays serialized)
                try:
                    pref, flen, _scores = self._finalize(self._state)
                    pref, flen = np.asarray(pref), np.asarray(flen)
                except Exception as e:  # device error: fail those sessions
                    with self._lock:
                        for i in newly_flushed:
                            s = self._slots[i]
                            if s is not None:
                                s["error"] = e
                                s["flushed"].set()
                else:
                    with self._lock:
                        for i in newly_flushed:
                            s = self._slots[i]
                            if s is not None:
                                s["final"] = [
                                    int(t) for t in pref[i, 0, : flen[i, 0]]
                                ]
                                s["flushed"].set()


class MicroBatcher:
    """Group concurrent single-utterance requests into fixed-shape batches.

    The exported artifact is compiled for a static ``[B, ...]`` input, but a
    server receives one utterance per request. The batcher queues requests,
    forms a device batch when ``batch_size`` are waiting or ``max_wait_ms``
    elapses since the first one (latency bound), zero-pads unused rows, runs
    ONE device call, and scatters the per-row results back to the waiters.
    All device work happens on the single worker thread, so the underlying
    ``infer`` never sees concurrent dispatch.
    """

    def __init__(self, infer, batch_size: int, row_shape: tuple,
                 max_wait_ms: float = 10.0):
        self._infer = infer
        self._batch_size = batch_size
        self._row_shape = tuple(row_shape)
        self._max_wait = max_wait_ms / 1e3
        self._queue: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, inputs: np.ndarray, input_len: int, timeout: float = 60.0):
        """Enqueue one utterance; block until its (ids, length) are ready."""
        inputs = np.asarray(inputs, np.float32)
        if inputs.shape != self._row_shape:
            raise ValueError(
                f"request shape {inputs.shape} != artifact row shape {self._row_shape}"
            )
        req = {"inputs": inputs, "len": int(input_len),
               "done": threading.Event(), "result": None, "error": None}
        self._queue.put(req)
        if not req["done"].wait(timeout):
            raise TimeoutError("inference timed out")
        if req["error"] is not None:
            raise req["error"]
        return req["result"]

    def stop(self):
        self._stop.set()
        self._worker.join(timeout=5.0)

    def _run(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            reqs = [first]
            deadline = time.monotonic() + self._max_wait
            while len(reqs) < self._batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    reqs.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            batch = np.zeros((self._batch_size,) + self._row_shape, np.float32)
            lens = np.zeros((self._batch_size,), np.int32)
            for i, r in enumerate(reqs):
                batch[i] = r["inputs"]
                lens[i] = r["len"]
            try:
                ids, n = self._infer(batch, lens)
                ids, n = np.asarray(ids), np.asarray(n)
                for i, r in enumerate(reqs):
                    r["result"] = (ids[i], int(n[i]))
            except Exception as e:  # surface device errors to every waiter
                for r in reqs:
                    r["error"] = e
            for r in reqs:
                r["done"].set()
