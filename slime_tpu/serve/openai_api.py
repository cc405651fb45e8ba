"""OpenAI-compatible API on top of the batched serving engine.

``/v1/chat/completions``, ``/v1/completions``, ``/v1/models`` — any OpenAI
SDK or curl script drives the SliME stack unchanged. The adapter renders
chat ``messages`` through the model's own conversation template
(conversation.py — the same byte-exact templates training used, reference
llava/conversation.py), maps OpenAI sampling fields onto the engine's
per-slot knobs, and translates ``response_format`` into the constrained-
decoding grammar tables (serve/grammar.py):

    {"type": "json_object"}                  -> generic flat-object regex
    {"type": "json_schema", "json_schema":
        {"schema": {...}}}                   -> schema-exact regex

Image content parts (``{"type": "image_url", "image_url": {"url":
"data:image/...;base64,..."}}``) become anyres-processed crops, same as the
reference's base64 wire format. Streaming uses real SSE (``data:`` frames +
``[DONE]``), the OpenAI wire format, via JsonHTTPServer.sse_route.

This is additive beyond the reference (which exposes only its own worker
protocol); it rides the worker's generate_stream path so every engine
feature — continuous batching, automatic prefix cache, speculative rounds,
quantized weights — applies to OpenAI traffic too.
"""
from __future__ import annotations

import time
import uuid
from typing import Iterable, List, Tuple

from ..constants import DEFAULT_IMAGE_TOKEN


def render_messages(messages: List[dict], conv) -> Tuple[str, List[str]]:
    """OpenAI ``messages`` -> (prompt string, base64 image payloads).

    ``conv`` is a fresh Conversation copy; a leading system message replaces
    its system prompt. Image parts inject the reference's ``<image>`` token
    ahead of the text of their message (llava/serve/gradio_web_server.py
    convention)."""
    conv = conv.copy()
    images: List[str] = []
    role_map = {"user": conv.roles[0], "assistant": conv.roles[1]}
    msgs = list(messages)
    if msgs and msgs[0].get("role") == "system":
        content = msgs.pop(0).get("content") or ""
        if not isinstance(content, str):   # content-part form
            content = " ".join(p.get("text", "") for p in content
                               if p.get("type") == "text")
        conv.system = content
    for m in msgs:
        role = role_map.get(m.get("role"))
        if role is None:
            raise ValueError(f"unsupported role {m.get('role')!r}")
        content = m.get("content")
        if isinstance(content, str):
            text = content
        else:
            parts, n_img = [], 0
            for part in content or []:
                if part.get("type") == "text":
                    parts.append(part.get("text", ""))
                elif part.get("type") == "image_url":
                    url = (part.get("image_url") or {}).get("url", "")
                    if not url.startswith("data:"):
                        raise ValueError(
                            "only data: image URLs are supported offline")
                    images.append(url.split(",", 1)[1])
                    n_img += 1
                else:
                    raise ValueError(f"unsupported part {part.get('type')!r}")
            text = "\n".join([DEFAULT_IMAGE_TOKEN] * n_img
                             + ["".join(parts)])
        conv.append_message(role, text)
    conv.append_message(conv.roles[1], None)   # generation prompt
    return conv.get_prompt(), images


def _worker_payload(body: dict, prompt: str, images: List[str]) -> dict:
    """OpenAI request fields -> worker generate_stream payload."""
    p = {"prompt": prompt, "images": images,
         "max_new_tokens": int(body.get("max_tokens")
                               or body.get("max_completion_tokens") or 256),
         # OpenAI defaults sample at temperature 1; explicit 0 is greedy
         "temperature": float(body.get("temperature", 1.0)),
         "top_p": float(body.get("top_p", 1.0)),
         "presence_penalty": float(body.get("presence_penalty", 0.0)),
         "frequency_penalty": float(body.get("frequency_penalty", 0.0))}
    # common extensions (vLLM/SGLang accept these too)
    for k in ("top_k", "min_p", "repetition_penalty", "prefix_id", "adapter"):
        if k in body:
            p[k] = body[k]
    if body.get("logprobs"):
        p["logprobs"] = max(1, int(body.get("top_logprobs") or 1))
    stop = body.get("stop")
    if isinstance(stop, list):
        stop = stop[0] if stop else None   # engine matcher takes one string
    if stop:
        p["stop"] = stop
    rf = body.get("response_format") or {}
    if rf.get("type") == "json_object":
        from .grammar import json_object_regex
        p["regex"] = json_object_regex()
    elif rf.get("type") == "json_schema":
        p["json_schema"] = (rf.get("json_schema") or {}).get("schema") \
            or rf.get("schema") or {}
    elif body.get("regex"):
        p["regex"] = body["regex"]
    elif body.get("choices_constraint"):
        p["choices"] = body["choices_constraint"]
    return p


def attach_openai_routes(srv, worker, conv_mode: str = None) -> None:
    """Register /v1/* on a JsonHTTPServer serving ``worker``."""
    from ..conversation import conv_mode_from_model_name, conv_templates
    mode = conv_mode or conv_mode_from_model_name(worker.model_name)
    template = conv_templates[mode]
    model_id = worker.model_name

    def models(_body: dict) -> dict:
        return {"object": "list",
                "data": [{"id": model_id, "object": "model",
                          "owned_by": "slime_tpu"}]}

    def _drive(body: dict, prompt: str, images: List[str]):
        """-> iterator of (delta_text, full_text, n_tokens, chunk)."""
        payload = _worker_payload(body, prompt, images)
        prev = ""
        for chunk in worker.generate_stream(payload):
            if chunk.get("error_code"):
                raise RuntimeError(chunk.get("text", "generation error"))
            text = chunk["text"]
            yield text[len(prev):], text, int(chunk.get("n_tokens", 0)), chunk
            prev = text

    def _openai_logprobs(chunk: dict):
        """Worker logprob entries -> the OpenAI chat logprobs block."""
        if not chunk.get("logprobs"):
            return None
        dec = lambda t: worker.tokenizer.decode([t])
        return {"content": [
            {"token": dec(e["token_id"]), "logprob": e["logprob"],
             "top_logprobs": [{"token": dec(t), "logprob": v}
                              for t, v in e["top"]]}
            for e in chunk["logprobs"]]}

    def _finish(body: dict, n_tokens: int) -> str:
        limit = int(body.get("max_tokens")
                    or body.get("max_completion_tokens") or 256)
        return "length" if n_tokens >= limit else "stop"

    def _count(prompt: str) -> int:
        out = worker.tokenizer(prompt)
        ids = out["input_ids"] if isinstance(out, dict) else out.input_ids
        return len(ids)

    def chat(body: dict) -> dict:
        prompt, images = render_messages(body.get("messages") or [], template)
        text, n = "", 0
        last = {}
        for _delta, text, n, last in _drive(body, prompt, images):
            pass
        n_prompt = _count(prompt)
        return {
            "id": "chatcmpl-" + uuid.uuid4().hex[:16],
            "object": "chat.completion",
            "created": int(time.time()),
            "model": model_id,
            "choices": [{"index": 0,
                         "message": {"role": "assistant", "content": text},
                         "logprobs": _openai_logprobs(last),
                         "finish_reason": _finish(body, n)}],
            "usage": {"prompt_tokens": n_prompt, "completion_tokens": n,
                      "total_tokens": n_prompt + n},
        }

    def chat_stream(body: dict) -> Iterable[dict]:
        prompt, images = render_messages(body.get("messages") or [], template)
        cid = "chatcmpl-" + uuid.uuid4().hex[:16]
        created = int(time.time())

        def frame(delta: dict, finish=None) -> dict:
            return {"id": cid, "object": "chat.completion.chunk",
                    "created": created, "model": model_id,
                    "choices": [{"index": 0, "delta": delta,
                                 "finish_reason": finish}]}

        yield frame({"role": "assistant", "content": ""})
        n = 0
        for delta, _text, n, _c in _drive(body, prompt, images):
            if delta:
                yield frame({"content": delta})
        yield frame({}, finish=_finish(body, n))

    def completions(body: dict) -> dict:
        prompt = body.get("prompt") or ""
        if isinstance(prompt, list):
            prompt = prompt[0] if prompt else ""
        text, n = "", 0
        for _d, text, n, _c in _drive(body, prompt, []):
            pass
        n_prompt = _count(prompt)
        return {
            "id": "cmpl-" + uuid.uuid4().hex[:16],
            "object": "text_completion",
            "created": int(time.time()),
            "model": model_id,
            "choices": [{"index": 0, "text": text,
                         "finish_reason": _finish(body, n)}],
            "usage": {"prompt_tokens": n_prompt, "completion_tokens": n,
                      "total_tokens": n_prompt + n},
        }

    def completions_stream(body: dict) -> Iterable[dict]:
        prompt = body.get("prompt") or ""
        if isinstance(prompt, list):
            prompt = prompt[0] if prompt else ""
        cid = "cmpl-" + uuid.uuid4().hex[:16]
        created = int(time.time())
        n = 0
        for delta, _text, n, _c in _drive(body, prompt, []):
            if delta:
                yield {"id": cid, "object": "text_completion",
                       "created": created, "model": model_id,
                       "choices": [{"index": 0, "text": delta,
                                    "finish_reason": None}]}
        yield {"id": cid, "object": "text_completion", "created": created,
               "model": model_id,
               "choices": [{"index": 0, "text": "",
                            "finish_reason": _finish(body, n)}]}

    # a path registered both ways streams iff the body posts stream=true
    # (JsonHTTPServer dispatch rule)
    srv.route("/v1/models", models)
    srv.route("/v1/chat/completions", chat)
    srv.sse_route("/v1/chat/completions", chat_stream)
    srv.route("/v1/completions", completions)
    srv.sse_route("/v1/completions", completions_stream)
