"""Checkpoint / resume for progressive renders.

The reference's only cross-frame state is the accumulated image + frame
counter (RayTracingManager.cs:33,26), never persisted (it resets on Start,
:43-46 - SURVEY.md section 5). Here that state is first-class: the
(accumulation image, frame index, config hash) tuple serializes to a single
.npz, and ``resume`` continues the running average exactly (the weighting
1/(frame+1) of Accumulate.shader:48 makes the average independent of where
it was interrupted).

A config hash guards against resuming with a different scene/camera/config,
which would silently average unrelated images (the reference HAS this bug:
moving the camera keeps averaging into stale history - we refuse instead).
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import numpy as np
import jax

from .config import RenderConfig


def state_hash(scene, camera, cfg: RenderConfig) -> str:
    """Stable fingerprint of everything that determines frame content."""
    h = hashlib.sha256()
    h.update(json.dumps(cfg.__dict__, sort_keys=True).encode())
    for leaf in jax.tree_util.tree_leaves((scene, camera)):
        arr = np.asarray(leaf)
        h.update(str(arr.dtype).encode())
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    return h.hexdigest()[:32]


def save(path, accum, frame: int, fingerprint: str) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.savez_compressed(
            f,
            accum=np.asarray(accum),
            frame=np.int64(frame),
            fingerprint=np.bytes_(fingerprint.encode()),
        )
    tmp.replace(path)  # atomic: a crash never leaves a torn checkpoint


def load(path, fingerprint: str | None = None):
    """Returns (accum (H, W, 3) np.float32, frame int). Raises ValueError on
    fingerprint mismatch (resuming a different render)."""
    with np.load(path) as z:
        accum = z["accum"].astype(np.float32)
        frame = int(z["frame"])
        saved_fp = bytes(z["fingerprint"]).decode()
    if fingerprint is not None and saved_fp != fingerprint:
        raise ValueError(
            "checkpoint fingerprint mismatch: the checkpoint was produced by "
            "a different scene/camera/config (refusing to average unrelated "
            f"renders; saved={saved_fp}, current={fingerprint})"
        )
    return accum, frame
