"""HTTP serving front-end: completions endpoint over the engine.

(ref analog: the vLLM OpenAI-server serving path the reference documents.)
"""

import json
import socket
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import pytest

from ao_tpu.models import llama
from ao_tpu.serving.engine import Engine, ServeConfig
from ao_tpu.serving.server import ServingFrontend


def _model():
    cfg = llama.LlamaConfig(
        vocab_size=128, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, tie_embeddings=True, dtype=jnp.float32,
    )
    return llama.init_params(jax.random.PRNGKey(0), cfg), cfg


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _post(port, path, obj, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _wait_up(port, deadline=30.0):
    t0 = time.time()
    while time.time() - t0 < deadline:
        try:
            socket.create_connection(("127.0.0.1", port), 0.2).close()
            return
        except OSError:
            time.sleep(0.05)
    raise TimeoutError("server did not come up")


@pytest.fixture(scope="module")
def frontend():
    params, cfg = _model()
    port = _free_port()
    fe = ServingFrontend(params, cfg, ServeConfig(
        max_batch=2, max_seq=64, prefill_buckets=(8,)), port=port)
    fe.start_background()
    _wait_up(port)
    yield params, cfg, port
    fe.shutdown()


class TestServer:
    def test_completion_matches_engine(self, frontend):
        params, cfg, port = frontend
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,)))
        eng.submit([3, 17, 42, 9], 6)
        ref = eng.run()[0].generated

        out = _post(port, "/v1/completions",
                    {"prompt": [3, 17, 42, 9], "max_tokens": 6})
        assert out["choices"][0]["token_ids"] == ref
        assert out["choices"][0]["finish_reason"] == "length"
        assert out["usage"]["completion_tokens"] == 6

    def test_concurrent_requests(self, frontend):
        params, cfg, port = frontend
        prompts = [[1, 2, 3], [7, 8], [10, 11, 12, 13], [99]]
        results = {}

        def go(i, p):
            results[i] = _post(port, "/v1/completions",
                               {"prompt": p, "max_tokens": 4})

        ts = [threading.Thread(target=go, args=(i, p))
              for i, p in enumerate(prompts)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=180)
        assert len(results) == len(prompts)
        for i, p in enumerate(prompts):
            eng = Engine(params, cfg, ServeConfig(
                max_batch=2, max_seq=64, prefill_buckets=(8,)))
            eng.submit(p, 4)
            assert results[i]["choices"][0]["token_ids"] == \
                eng.run()[0].generated, i

    def test_stats_and_errors(self, frontend):
        params, cfg, port = frontend
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/v1/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["finished_requests"] >= 1
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(port, "/v1/completions", {"prompt": "not ids"})
        assert ei.value.code == 400


class TestStreaming:
    def test_sse_stream_matches_non_streaming(self, frontend):
        params, cfg, port = frontend
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,)))
        eng.submit([5, 6, 7], 6)
        ref = eng.run()[0].generated

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=json.dumps({"prompt": [5, 6, 7], "max_tokens": 6,
                             "stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        toks, chunks = [], 0
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"] == "text/event-stream"
            for raw in r:
                line = raw.decode().strip()
                if not line.startswith("data: "):
                    continue
                payload = line[6:]
                if payload == "[DONE]":
                    break
                toks.extend(json.loads(payload)["choices"][0]["token_ids"])
                chunks += 1
        assert toks == ref
        assert chunks >= 1
