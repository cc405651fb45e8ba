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
