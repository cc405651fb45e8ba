"""Serving stack integration test: controller + worker over real HTTP on
localhost, heartbeat registration, dispatch, streamed generation end-to-end."""
import base64
import io
import json
import threading
import time

import numpy as np
import pytest

requests = pytest.importorskip("requests")

import jax

from slime_tpu.config import SliMEConfig
from slime_tpu.models import slime
from slime_tpu.serve.controller import Controller, build_server as build_controller
from slime_tpu.serve.model_worker import ModelWorker, build_server as build_worker
from slime_tpu.serve.protocol import iter_stream_response

from .toy_tokenizer import ToyTokenizer


@pytest.fixture(scope="module")
def stack():
    import jax.numpy as jnp

    cfg = SliMEConfig.tiny()
    params = slime.init(jax.random.PRNGKey(0), cfg)
    tok = ToyTokenizer()
    # seed the toy vocab so decode is meaningful
    tok("hello world what is in the picture a cat sits here")

    ctrl = Controller("shortest_queue")
    csrv = build_controller(ctrl, "localhost", 0)
    cport = csrv.port
    threading.Thread(target=csrv.serve_forever, daemon=True).start()

    worker = ModelWorker(
        controller_addr=f"http://localhost:{cport}",
        worker_addr=None, model_name="slime-tiny", params=params, cfg=cfg,
        tokenizer=tok, compute_dtype=jnp.float32, register=False)
    wsrv = build_worker(worker, "localhost", 0)
    wport = wsrv.port
    worker.worker_addr = f"http://localhost:{wport}"
    threading.Thread(target=wsrv.serve_forever, daemon=True).start()
    worker.controller_addr = f"http://localhost:{cport}"
    worker.register_to_controller()

    yield cport, wport, cfg, tok
    csrv.shutdown()
    wsrv.shutdown()


def test_registration_and_listing(stack):
    cport, wport, cfg, tok = stack
    r = requests.post(f"http://localhost:{cport}/list_models", json={}, timeout=5)
    assert r.json()["models"] == ["slime-tiny"]
    r = requests.post(f"http://localhost:{cport}/get_worker_address",
                      json={"model": "slime-tiny"}, timeout=5)
    assert r.json()["address"] == f"http://localhost:{wport}"
    r = requests.post(f"http://localhost:{cport}/get_worker_address",
                      json={"model": "nope"}, timeout=5)
    assert r.json()["address"] == ""


def test_heartbeat(stack):
    cport, wport, cfg, tok = stack
    r = requests.post(f"http://localhost:{cport}/receive_heart_beat",
                      json={"worker_name": f"http://localhost:{wport}",
                            "queue_length": 2}, timeout=5)
    assert r.json()["exist"] is True


def test_text_generation_stream(stack):
    cport, wport, cfg, tok = stack
    r = requests.post(f"http://localhost:{wport}/worker_generate_stream",
                      json={"prompt": "hello world what is", "max_new_tokens": 6,
                            "temperature": 0.0}, stream=True, timeout=120)
    chunks = list(iter_stream_response(r))
    assert chunks, "no stream chunks"
    assert all(c["error_code"] == 0 for c in chunks)
    assert isinstance(chunks[-1]["text"], str)


def test_multimodal_generation_via_controller_proxy(stack):
    from PIL import Image

    cport, wport, cfg, tok = stack
    buf = io.BytesIO()
    Image.new("RGB", (400, 300), (0, 120, 240)).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    r = requests.post(f"http://localhost:{cport}/worker_generate_stream",
                      json={"model": "slime-tiny",
                            "prompt": "<image>\nwhat is in the picture",
                            "images": [b64], "max_new_tokens": 4,
                            "temperature": 0.0}, stream=True, timeout=300)
    chunks = list(iter_stream_response(r))
    assert chunks
    assert chunks[-1]["error_code"] == 0


def test_image_count_mismatch_is_error(stack):
    cport, wport, cfg, tok = stack
    r = requests.post(f"http://localhost:{wport}/worker_generate_stream",
                      json={"prompt": "no image token here",
                            "images": ["aGVsbG8="], "max_new_tokens": 4},
                      stream=True, timeout=60)
    chunks = list(iter_stream_response(r))
    assert chunks[-1]["error_code"] != 0


def test_two_image_generation(stack):
    from PIL import Image

    cport, wport, cfg, tok = stack
    def b64img(color):
        buf = io.BytesIO()
        Image.new("RGB", (300, 300), color).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()
    r = requests.post(f"http://localhost:{wport}/worker_generate_stream",
                      json={"prompt": "<image> and <image> what differs",
                            "images": [b64img((255, 0, 0)), b64img((0, 0, 255))],
                            "max_new_tokens": 3, "temperature": 0.0},
                      stream=True, timeout=600)
    chunks = list(iter_stream_response(r))
    assert chunks and chunks[-1]["error_code"] == 0


def test_multi_worker_dispatch():
    """shortest_queue picks the least-loaded worker; lottery respects speed=0."""
    from slime_tpu.serve.controller import Controller

    c = Controller("shortest_queue")
    c.register_worker("http://w1", False, {"model_names": ["m"], "speed": 1,
                                           "queue_length": 5})
    c.register_worker("http://w2", False, {"model_names": ["m"], "speed": 1,
                                           "queue_length": 0})
    assert c.get_worker_address("m") == "http://w2"
    # the pick bumped w2's queue; repeated picks alternate as queues grow
    for _ in range(6):
        c.get_worker_address("m")
    assert c.workers["http://w1"].queue_length >= 5

    lot = Controller("lottery")
    lot.register_worker("http://a", False, {"model_names": ["m"], "speed": 0,
                                            "queue_length": 0})
    lot.register_worker("http://b", False, {"model_names": ["m"], "speed": 2,
                                            "queue_length": 0})
    picks = {lot.get_worker_address("m") for _ in range(20)}
    assert picks == {"http://b"}  # zero-speed worker never chosen


def test_worker_expiry():
    from slime_tpu.serve.controller import Controller
    c = Controller("shortest_queue")
    c.register_worker("http://dead", True, {"model_names": ["m"], "speed": 1,
                                            "queue_length": 0})
    # simulate heartbeat timeout
    c.workers["http://dead"].last_heart_beat = 0
    import time as _t
    from slime_tpu.constants import CONTROLLER_HEART_BEAT_EXPIRATION
    expire = _t.time() - CONTROLLER_HEART_BEAT_EXPIRATION
    with c.lock:
        dead = [n for n, w in c.workers.items()
                if w.check_heart_beat and w.last_heart_beat < expire]
        for n in dead:
            del c.workers[n]
    assert "http://dead" not in c.workers


# ---------------------------------------------------------------------------
# Gradio web server's plain functions (VERDICT r2 #8): everything controller-
# facing is testable without gradio installed — model listing, image
# hashing/logging, template routing, streamed chat assembly against the live
# test stack. Reference: llava/serve/gradio_web_server.py:154-310.
# ---------------------------------------------------------------------------

def test_gradio_get_model_list(stack):
    from slime_tpu.serve import gradio_web_server as gws

    cport, wport, cfg, tok = stack
    assert gws.get_model_list(f"http://localhost:{cport}") == ["slime-tiny"]


def test_gradio_save_image_and_log(tmp_path, monkeypatch):
    from PIL import Image

    from slime_tpu.serve import gradio_web_server as gws

    img = Image.new("RGB", (32, 20), (200, 10, 10))
    b64 = gws.save_image(img, out_dir=str(tmp_path))
    import base64
    import hashlib
    data = base64.b64decode(b64)
    h = hashlib.md5(data).hexdigest()
    assert (tmp_path / f"{h}.png").exists()          # hashed, persisted
    # idempotent: same content -> same file, no duplicate
    gws.save_image(img, out_dir=str(tmp_path))
    assert len(list(tmp_path.iterdir())) == 1

    monkeypatch.setattr(gws, "get_conv_log_filename",
                        lambda: str(tmp_path / "conv.json"))
    gws.log_record({"type": "upvote", "model": "m"})
    rec = json.loads(open(tmp_path / "conv.json").read().strip())
    assert rec["type"] == "upvote"


def test_gradio_template_routing():
    """Per-model conversation-template selection, the add_text logic
    (gradio_web_server.py:154-176): llama3 names route to the llama3 template,
    image goes in only on the first turn."""
    from slime_tpu.conversation import conv_mode_from_model_name, conv_templates

    mode = conv_mode_from_model_name("slime-llama3-8b")
    assert mode == "llama3"
    conv = conv_templates[mode].copy()
    conv.append_message(conv.roles[0], "<image>\nwhat is this?")
    conv.append_message(conv.roles[1], None)
    p = conv.get_prompt()
    assert "<image>" in p and p.rstrip().endswith("<|end_header_id|>")


def test_gradio_stream_chat_against_live_stack(stack):
    """stream_chat drives the controller's /worker_generate_stream proxy and
    yields cumulative partial texts."""
    from slime_tpu.conversation import conv_templates
    from slime_tpu.serve import gradio_web_server as gws

    cport, wport, cfg, tok = stack
    conv = conv_templates["v1"].copy()
    conv.append_message(conv.roles[0], "hello world what is")
    conv.append_message(conv.roles[1], None)
    texts = list(gws.stream_chat(f"http://localhost:{cport}", "slime-tiny",
                                 conv, None, temperature=0.0,
                                 max_new_tokens=4))
    assert texts, "no streamed chunks"
    assert all(isinstance(t, str) for t in texts)
    from slime_tpu.serve.protocol import SERVER_ERROR_MSG
    assert texts[-1] != SERVER_ERROR_MSG


def test_gradio_stream_chat_error_path(tmp_path, monkeypatch):
    """Unreachable controller -> the SERVER_ERROR_MSG sentinel, and the chat
    is still logged."""
    from slime_tpu.conversation import conv_templates
    from slime_tpu.serve import gradio_web_server as gws
    from slime_tpu.serve.protocol import SERVER_ERROR_MSG

    monkeypatch.setattr(gws, "get_conv_log_filename",
                        lambda: str(tmp_path / "conv.json"))
    conv = conv_templates["v1"].copy()
    conv.append_message(conv.roles[0], "hi")
    conv.append_message(conv.roles[1], None)
    texts = list(gws.stream_chat("http://localhost:1", "m", conv, None))
    assert texts == [SERVER_ERROR_MSG]
    assert (tmp_path / "conv.json").exists()


def test_gradio_build_demo_gate():
    """Without gradio installed, build_demo raises the documented ImportError
    (the HTTP API stays functional)."""
    from slime_tpu.serve import gradio_web_server as gws
    try:
        import gradio  # noqa: F401
        pytest.skip("gradio installed here; gate not exercisable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="gradio is not installed"):
        gws.build_demo("http://localhost:1")


def test_moderation_hook(monkeypatch):
    """violates_moderation (reference llava/utils.py:102-120): no-op without an
    API key; flags via the API response when a key is present; fails open on
    network errors."""
    from slime_tpu.serve import gradio_web_server as gws

    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    assert gws.violates_moderation("anything") is False  # zero-egress default

    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")

    class FakeResp:
        def __init__(self, flagged):
            self._flagged = flagged

        def json(self):
            return {"results": [{"flagged": self._flagged}]}

    import requests
    monkeypatch.setattr(requests, "post",
                        lambda *a, **k: FakeResp(True))
    assert gws.violates_moderation("bad text") is True
    monkeypatch.setattr(requests, "post",
                        lambda *a, **k: FakeResp(False))
    assert gws.violates_moderation("fine text") is False

    def boom(*a, **k):
        raise requests.RequestException("no egress")

    monkeypatch.setattr(requests, "post", boom)
    assert gws.violates_moderation("text") is False  # fail-open, like reference
