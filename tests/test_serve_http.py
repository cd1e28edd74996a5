"""HTTP serving front-end (serve/http.py + cli/serve_http.py).

The server is a thin concurrency shell over the engine: handlers enqueue,
one driver thread owns the engine.  Contracts: concurrent HTTP completions
equal direct engine drains; bad payloads return 400 without killing the
loop; stats and health respond."""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_unlearning_tpu.config import get_model_identifiers, load_config
from multimodal_unlearning_tpu.config.registry import config_dir
from multimodal_unlearning_tpu.models import llama
from multimodal_unlearning_tpu.serve import EngineServer, ServingEngine


def _post(url, payload, timeout=300):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _get(url, timeout=60):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def server():
    arch = get_model_identifiers("tiny-llama-test").arch
    cfg = llama.LlamaConfig.from_registry(arch)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    engine = ServingEngine(
        params, cfg, "llama", num_slots=2, max_len=128, chunk=3,
        bucket_multiple=16, pad_token_id=0, eos_token_id=None,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    # byte-level codec: prompts are raw byte strings (vocab 256)
    enc = lambda text: [min(b, cfg.vocab_size - 1) for b in text.encode()]
    dec = lambda ids: bytes(int(t) % 256 for t in ids).decode("latin1")
    srv = EngineServer(engine, enc, dec, default_max_tokens=6)
    host, port = srv.serve(port=0)
    yield srv, f"http://{host}:{port}", cfg, params, enc
    srv.shutdown()


def test_http_completions_match_direct_engine(server):
    srv, url, cfg, params, enc = server
    assert _get(f"{url}/health")["ok"]

    prompts = ["who is A?", "tell me about B", "c?"]
    budgets = [5, 7, 4]
    results = [None] * len(prompts)

    def hit(i):
        results[i] = _post(f"{url}/v1/completions",
                           {"prompt": prompts[i], "max_tokens": budgets[i]})

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert all(r is not None for r in results)

    # direct engine drains (fresh engine, same weights) as ground truth
    engine = ServingEngine(
        params, cfg, "llama", num_slots=2, max_len=128, chunk=3,
        bucket_multiple=16, pad_token_id=0, eos_token_id=None,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    want = engine.drain([engine.submit(enc(p), m) for p, m in zip(prompts, budgets)])
    got = [[ord(c) for c in r["text"]] for r in results]
    assert got == [[t % 256 for t in w] for w in want]
    for r, m in zip(results, budgets):
        assert r["tokens"] == m and r["latency_s"] >= r["ttft_s"] >= 0

    st = _get(f"{url}/v1/stats")
    assert st["prefills"] >= 3 and st["emitted"] >= sum(budgets) - 3


def test_http_bad_payloads_do_not_kill_loop(server):
    srv, url, *_ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{url}/v1/completions", {"max_tokens": 4})  # no prompt
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{url}/v1/completions", {"prompt": "x", "adapter": "nope"})
    assert e.value.code == 400  # unknown adapter -> engine KeyError -> 400
    # the loop survives: a good request still completes
    r = _post(f"{url}/v1/completions", {"prompt": "still alive?", "max_tokens": 3})
    assert r["tokens"] == 3


def test_make_server_from_config(tmp_path):
    """cli.serve_http.make_server: config -> chat-template codec -> engine."""
    from multimodal_unlearning_tpu.cli import serve_http

    cfg = load_config(config_dir() / "mm", "serve")
    for k, v in {
        "model_family": "tiny-llava-test", "model_path": None,
        "processor_path": None, "num_slots": 2, "max_length": 256,
        "chunk": 4, "dtype": "float32", "quantize_base": False,
    }.items():
        dict.__setitem__(cfg, k, v)
    dict.__setitem__(cfg["generation"], "max_new_tokens", 4)
    srv = serve_http.make_server(cfg)
    host, port = srv.serve(port=0)
    try:
        out = _post(f"http://{host}:{port}/v1/completions",
                    {"prompt": "What color is the sky?"})
        assert out["tokens"] >= 1 and isinstance(out["text"], str)
    finally:
        srv.shutdown()


def test_http_stop_string_truncates_text(server):
    """Stop strings match at TEXT level (BPE boundary merges can defeat
    token-id matching) and cancel the request on device."""
    srv, url, cfg, params, enc = server
    free = _post(f"{url}/v1/completions",
                 {"prompt": "stoptest", "max_tokens": 10})
    text = free["text"]
    stop = text[3:5]
    want = text[: text.find(stop)]  # EARLIEST occurrence wins
    out = _post(f"{url}/v1/completions",
                {"prompt": "stoptest", "max_tokens": 10, "stop": stop})
    assert out["text"] == want
    # list form + a never-occurring stop leaves the stream whole
    out2 = _post(f"{url}/v1/completions",
                 {"prompt": "stoptest", "max_tokens": 10,
                  "stop": ["ÿÿÿ"]})
    assert out2["text"] == text


def test_http_streaming_sse(server):
    """'stream': true returns Server-Sent Events whose concatenated text
    deltas equal the non-streamed completion."""
    srv, url, cfg, params, enc = server
    want = _post(f"{url}/v1/completions",
                 {"prompt": "stream me", "max_tokens": 40})["text"]

    req = urllib.request.Request(
        f"{url}/v1/completions",
        data=json.dumps({"prompt": "stream me", "max_tokens": 40,
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    deltas = []
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for raw in r:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            body = line[len("data: "):]
            if body == "[DONE]":
                break
            deltas.append(json.loads(body)["text"])
    assert "".join(deltas) == want
    assert len(deltas) >= 2  # actually streamed, not one final blob
