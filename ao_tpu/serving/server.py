"""Minimal OpenAI-style HTTP front-end over the serving engine.

(ref analog: the reference serves through vLLM's OpenAI server
(docs/source/eager_tutorials/serving.rst); here the loop is in-framework.
Token-id interface — tokenization is the application's concern, like the
reference's benchmark harnesses.)

Endpoints (JSON over POST, stdlib http.server — no extra dependencies):
  POST /v1/completions   {"prompt": [ids], "max_tokens": N,
                          "temperature"?, "top_k"?, "top_p"?, "min_p"?,
                          "stop"?: [ids] | [[ids], ...]}
                       → {"id", "choices": [{"token_ids", "finish_reason"}],
                          "usage": {...}}
  GET  /v1/stats        → Engine.stats()

The HTTP threads only enqueue requests and wait on events; a single
driver thread owns the engine and the device (JAX programs are not
thread-safe to interleave), batching whatever is queued each step —
continuous batching falls out of the engine's slot scheduler.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

from ao_tpu.serving.engine import Engine, ServeConfig


class ServingFrontend:
    """Owns the engine + driver thread; serves HTTP on ``port``."""

    def __init__(self, params: Any, model_cfg: Any, serve_cfg: ServeConfig,
                 port: int = 8000):
        self.engine = Engine(params, model_cfg, serve_cfg)
        self.port = port
        self._lock = threading.Lock()
        self._events: Dict[int, threading.Event] = {}
        self._results: Dict[int, Dict[str, Any]] = {}
        self._requests: Dict[int, Any] = {}  # uid → live Request (streaming)
        self._stop = threading.Event()
        # step-progress signal for streaming handlers: they must BLOCK
        # between chunks (high-frequency polling while a device transfer
        # is in flight wedges the remote-TPU runtime — observed on axon)
        self._progress = threading.Condition()
        self._driver = threading.Thread(target=self._drive, daemon=True)
        self._httpd: Optional[ThreadingHTTPServer] = None

    # -- request path --------------------------------------------------------

    def submit(self, prompt, max_tokens: int, temperature=None,
               top_k=None, top_p=None, min_p=None, stop=None,
               repetition_penalty=None, frequency_penalty=None,
               presence_penalty=None, logprobs=None,
               logit_bias=None) -> int:
        ev = threading.Event()
        with self._lock:
            uid = self.engine.submit(list(prompt), max_tokens,
                                     temperature=temperature, top_k=top_k,
                                     top_p=top_p, min_p=min_p, stop=stop,
                                     repetition_penalty=repetition_penalty,
                                     frequency_penalty=frequency_penalty,
                                     presence_penalty=presence_penalty,
                                     logprobs=logprobs,
                                     logit_bias=logit_bias)
            self._events[uid] = ev
            self._requests[uid] = self.engine._queue[-1]
        return uid

    def wait(self, uid: int, timeout: float = 300.0) -> Dict[str, Any]:
        ev = self._events[uid]
        if not ev.wait(timeout):
            with self._lock:  # don't leak bookkeeping for abandoned requests
                self._events.pop(uid, None)
                self._requests.pop(uid, None)
                self._results.pop(uid, None)
            raise TimeoutError(f"request {uid} timed out")
        with self._lock:
            self._events.pop(uid, None)
            self._requests.pop(uid, None)
            return self._results.pop(uid)

    def _fail_all_locked(self):
        """Resolve every in-flight request with an error result (called with
        self._lock held, after an engine.step() exception)."""
        reqs = [r for r in self.engine._queue if r is not None]
        reqs += [r for r in self.engine._slots if r is not None]
        for req in reqs:
            try:
                self.engine.cancel(req.uid)
            except Exception:
                pass
            self._results[req.uid] = {
                "token_ids": list(req.generated),
                "finish_reason": "error",
                "prompt_tokens": len(req.prompt),
            }
            ev = self._events.get(req.uid)
            if ev is not None:
                ev.set()
        self.engine._queue.clear()
        self.engine._slots = [None] * len(self.engine._slots)

    def _drive(self):
        import time

        while not self._stop.is_set():
            with self._lock:
                busy = bool(self.engine._queue) or any(
                    s is not None for s in self.engine._slots)
                if busy:
                    try:
                        self.engine.step()
                    except Exception:
                        # A failing admit/step must not kill the driver
                        # thread (one bad request would wedge the server).
                        # Fail every in-flight request and keep serving.
                        import traceback

                        traceback.print_exc()
                        self._fail_all_locked()
                    done = self.engine._finished
                    self.engine._finished = []
                else:
                    done = []
                for req in done:
                    res = {
                        "token_ids": req.generated,
                        "finish_reason": req.finish_reason or "length",
                        "prompt_tokens": len(req.prompt),
                    }
                    if req.logprobs is not None:
                        res["logprobs"] = {
                            "token_logprobs": req.token_logprobs,
                            "top_logprobs": [
                                {str(t): lp for t, lp in step}
                                for step in req.top_logprobs
                            ] if req.logprobs else None,
                        }
                    self._results[req.uid] = res
                    ev = self._events.get(req.uid)
                    if ev is not None:
                        ev.set()
            with self._progress:
                self._progress.notify_all()
            if not busy:
                time.sleep(0.005)

    # -- http ----------------------------------------------------------------

    def serve_forever(self):
        frontend = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, code, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _stream(self, uid):
                """Server-sent events: emit new token ids as the driver
                thread appends them, then a [DONE] sentinel."""
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.end_headers()
                live = frontend._requests.get(uid)
                sent = 0
                try:
                    while True:
                        # snapshot without locks (list()/dict reads are
                        # GIL-atomic); block on the driver's progress signal
                        # between chunks — NOT a fast poll, which wedges the
                        # remote-TPU transfer path. Read `done` BEFORE the
                        # token snapshot: once done is observed true the
                        # generated list no longer grows, so the snapshot
                        # taken after it is complete (the reverse order could
                        # drop tail tokens appended between the two reads).
                        done = uid in frontend._results
                        toks = list(live.generated) if live else []
                        if len(toks) > sent:
                            chunk = {"id": f"cmpl-{uid}",
                                     "choices": [{"index": 0,
                                                  "token_ids": toks[sent:]}]}
                            self.wfile.write(
                                f"data: {json.dumps(chunk)}\n\n".encode())
                            self.wfile.flush()
                            sent = len(toks)
                        if done and sent >= len(toks):
                            # >=: a stop-sequence match trims tokens the
                            # stream may have already emitted
                            break
                        with frontend._progress:
                            frontend._progress.wait(10.0)
                    self.wfile.write(b"data: [DONE]\n\n")
                    self.wfile.flush()
                finally:
                    # always drop bookkeeping, even on client disconnect
                    frontend._events.pop(uid, None)
                    frontend._requests.pop(uid, None)
                    frontend._results.pop(uid, None)

            def do_GET(self):
                if self.path == "/v1/stats":
                    with frontend._lock:
                        self._json(200, frontend.engine.stats())
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/v1/completions":
                    self._json(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n))
                    prompt = req["prompt"]
                    if not (isinstance(prompt, list) and
                            all(isinstance(t, int) for t in prompt)):
                        raise ValueError("prompt must be a list of token ids")
                    if not prompt:
                        raise ValueError("prompt must be non-empty")
                    max_seq = frontend.engine.cfg.max_seq
                    if len(prompt) >= max_seq:
                        raise ValueError(
                            f"prompt length {len(prompt)} exceeds the "
                            f"engine's max_seq-1 ({max_seq - 1})")
                    t = req.get("temperature")
                    tk, tp = req.get("top_k"), req.get("top_p")
                    mp, stop = req.get("min_p"), req.get("stop")
                    rp = req.get("repetition_penalty")
                    fp = req.get("frequency_penalty")
                    pp = req.get("presence_penalty")
                    lp = req.get("logprobs")
                    lb = req.get("logit_bias")
                    if lb is not None:
                        lb = {int(k): float(v) for k, v in lb.items()}
                    uid = frontend.submit(
                        prompt, int(req.get("max_tokens", 32)),
                        temperature=None if t is None else float(t),
                        top_k=None if tk is None else int(tk),
                        top_p=None if tp is None else float(tp),
                        min_p=None if mp is None else float(mp),
                        stop=stop,
                        repetition_penalty=None if rp is None else float(rp),
                        frequency_penalty=None if fp is None else float(fp),
                        presence_penalty=None if pp is None else float(pp),
                        logprobs=None if lp is None else int(lp),
                        logit_bias=lb)
                    if req.get("stream"):
                        self._stream(uid)
                        return
                    out = frontend.wait(uid)
                except (KeyError, ValueError, json.JSONDecodeError) as e:
                    self._json(400, {"error": str(e)})
                    return
                except TimeoutError as e:
                    self._json(504, {"error": str(e)})
                    return
                choice = {
                    "index": 0,
                    "token_ids": out["token_ids"],
                    "finish_reason": out["finish_reason"],
                }
                if "logprobs" in out:
                    choice["logprobs"] = out["logprobs"]
                self._json(200, {
                    "id": f"cmpl-{uid}",
                    "object": "completion",
                    "choices": [choice],
                    "usage": {
                        "prompt_tokens": out["prompt_tokens"],
                        "completion_tokens": len(out["token_ids"]),
                    },
                })

        self._driver.start()
        self._httpd = ThreadingHTTPServer(("127.0.0.1", self.port), Handler)
        try:
            self._httpd.serve_forever()
        finally:
            self.shutdown()

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self._stop.set()
        if self._httpd is not None:
            self._httpd.shutdown()
