"""Serving stack integration: controller + worker threads, one message
through the full HTTP path (the reference's test_message.py smoke test as an
automated test)."""

import json
import threading
import time

import numpy as np
import pytest

from memory_augmented_vlm_tpu.serve import client as client_mod
from memory_augmented_vlm_tpu.serve.controller import Controller, make_handler as controller_handler, serve as serve_controller
from memory_augmented_vlm_tpu.serve.model_worker import ModelWorker, make_handler as worker_handler
from http.server import ThreadingHTTPServer

from tests.test_builder_roundtrip import ckpt_dir  # fixture reuse


@pytest.fixture(scope="module")
def stack(ckpt_dir):
    ctrl_srv = serve_controller("127.0.0.1", 0)
    ctrl_port = ctrl_srv.server_address[1]
    threading.Thread(target=ctrl_srv.serve_forever, daemon=True).start()
    ctrl_addr = f"http://127.0.0.1:{ctrl_port}"

    # worker on an ephemeral port
    worker_srv_holder = {}

    def start_worker():
        worker = ModelWorker(ctrl_addr, "PENDING", ckpt_dir,
                             model_name="tiny-mavlm", register=False)
        srv = ThreadingHTTPServer(("127.0.0.1", 0), worker_handler(worker))
        worker.worker_addr = f"http://127.0.0.1:{srv.server_address[1]}"
        worker.register_to_controller()
        worker_srv_holder["srv"] = srv
        worker_srv_holder["worker"] = worker
        srv.serve_forever()

    threading.Thread(target=start_worker, daemon=True).start()
    for _ in range(100):
        time.sleep(0.1)
        try:
            models = client_mod.post_json(ctrl_addr + "/list_models", {})["models"]
            if "tiny-mavlm" in models:
                break
        except Exception:
            pass
    return ctrl_addr


def test_list_models_and_dispatch(stack):
    models = client_mod.post_json(stack + "/list_models", {})["models"]
    assert "tiny-mavlm" in models
    addr = client_mod.post_json(stack + "/get_worker_address",
                                {"model": "tiny-mavlm"})["address"]
    assert addr.startswith("http://127.0.0.1:")
    # unknown model -> empty address
    none = client_mod.post_json(stack + "/get_worker_address",
                                {"model": "nope"})["address"]
    assert none == ""


def test_message_through_stack(stack):
    outs = list(client_mod.stream_generate(
        stack, "tiny-mavlm", "hello world", max_new_tokens=3))
    assert outs, "no stream chunks"
    assert outs[-1]["error_code"] == 0
    assert outs[-1]["text"].startswith("hello world")


def test_heartbeat_updates_queue(stack):
    ok = client_mod.post_json(stack + "/receive_heart_beat", {
        "worker_name": client_mod.post_json(
            stack + "/get_worker_address", {"model": "tiny-mavlm"})["address"],
        "queue_length": 0})
    assert ok["exist"]


def test_streaming_is_incremental(stack):
    """The worker must emit multiple growing chunks (TextIteratorStreamer
    semantics), not one final blob."""
    outs = list(client_mod.stream_generate(
        stack, "tiny-mavlm", "tell me something", max_new_tokens=24))
    assert outs[-1]["error_code"] == 0
    assert len(outs) >= 2, f"expected incremental chunks, got {len(outs)}"
    texts = [o["text"] for o in outs]
    for a, b in zip(texts, texts[1:]):
        assert b.startswith(a[: len("tell me something")])
    assert len(texts[-1]) >= len(texts[0])


@pytest.fixture(scope="module")
def web_ui(stack):
    from memory_augmented_vlm_tpu.serve.web_server import make_handler

    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(stack))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return f"http://127.0.0.1:{srv.server_address[1]}"


def test_web_ui_page_and_templates(web_ui):
    import urllib.request

    with urllib.request.urlopen(web_ui + "/", timeout=10) as r:
        page = r.read().decode()
    assert "mavlm_tpu chat" in page and "regenerate" in page
    t = client_mod.post_json(web_ui + "/templates", {})
    assert "qwen_1_5" in t["templates"] and len(t["templates"]) >= 21


def test_web_ui_chat_streams_ndjson(web_ui):
    import urllib.request

    req = urllib.request.Request(
        web_ui + "/chat",
        data=json.dumps({
            "model": "tiny-mavlm", "template": "qwen_1_5",
            "history": [[0, "hi there"]], "images": [],
            "temperature": 0.0, "max_new_tokens": 12,
        }).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        lines = [json.loads(l) for l in r.read().splitlines() if l.strip()]
    assert lines, "no streamed lines"
    assert lines[-1]["error_code"] == 0
    # the prompt echo is stripped: the text is pure assistant output
    assert not lines[-1]["text"].startswith("<|im_start|>")


def test_web_ui_prompt_rendering_multi_image():
    from memory_augmented_vlm_tpu.serve.web_server import _render_prompt

    out = _render_prompt("qwen_1_5", [[0, "compare these"]], num_images=2)
    assert out.count("<image>") == 2
    assert out.endswith("<|im_start|>assistant\n")
