"""Training-state checkpointing: save/restore params + optimizer state + step.

The reference relies on HF Trainer's checkpoint-resume (SURVEY.md §5: "Training has
no fault tolerance beyond HF Trainer checkpoint resume"). Here the full train state
(params, Adam moments, step counter, data-order epoch/seed) round-trips through
Orbax so an interrupted run resumes bit-exactly, including under sharding (Orbax
restores to the live mesh layout).
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


_ASYNC = None  # module-level AsyncCheckpointer (owns a background thread pool)


def save_train_state(path: str, state: Dict, extra: Optional[Dict] = None,
                     async_save: bool = False) -> None:
    """Atomic save of the full train state pytree + metadata.

    async_save=True hands the device->host copy to Orbax's AsyncCheckpointer and
    returns immediately — training continues while the write streams to disk
    (the next save or wait_for_saves() joins it). For multi-GB states this hides
    the full serialization latency behind compute."""
    global _ASYNC
    ocp = _ocp()
    path = os.path.abspath(path)
    if async_save:
        if _ASYNC is None:
            _ASYNC = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        _ASYNC.save(path, state, force=True)
        if extra:  # sibling file — the ckpt dir itself appears atomically later
            with open(path + ".meta.json", "w") as f:
                json.dump(extra, f)
        return
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=True)
    if extra:
        with open(os.path.join(path, "trainer_meta.json"), "w") as f:
            json.dump(extra, f)


def wait_for_saves() -> None:
    """Block until all in-flight async saves are durable (call before exit)."""
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def restore_train_state(path: str, target: Optional[Dict] = None) -> Dict:
    """Restore; with ``target`` (an abstract/concrete state of the right structure)
    the result matches its shardings/dtypes."""
    ocp = _ocp()
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(path, item=target)
    return ckptr.restore(path)


def load_meta(path: str) -> Dict:
    path = os.path.abspath(path)
    for fp in (os.path.join(path, "trainer_meta.json"), path + ".meta.json"):
        if os.path.exists(fp):
            with open(fp) as f:
                return json.load(f)
    return {}


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Most recent 'state-<step>' dir under output_dir (HF-style resume discovery)."""
    if not os.path.isdir(output_dir):
        return None
    cands = []
    for d in os.listdir(output_dir):
        if d.startswith("state-") and d[6:].isdigit():
            cands.append((int(d[6:]), os.path.join(output_dir, d)))
    return max(cands)[1] if cands else None
