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


def _leaf_checksums(leaves):
    """One device reduction per leaf, stacked into ONE (2n,) f32 array -
    a single host transfer regardless of leaf count."""
    import jax.numpy as jnp

    out = []
    for x in leaves:
        x = jnp.asarray(x).astype(jnp.float32).ravel()
        # position-weighted second moment makes permutations detectable
        w = jnp.arange(x.shape[0], dtype=jnp.float32) * np.float32(1e-3)
        out.append(jnp.sum(x))
        out.append(jnp.sum(x * (w + 1.0)))
    return jnp.stack(out) if out else jnp.zeros((1,), jnp.float32)


def state_hash(scene, camera, cfg: RenderConfig) -> str:
    """Stable fingerprint of everything that determines frame content.

    The scene contributes SceneBuilder.build()'s host-computed exact
    byte hash (scene.content_hash) when present - free. Cameras built by
    ops.camera.look_at carry host numpy leaves, so hashing their bytes
    is also free. Device-resident leaves (a scene that lost its
    content_hash to a jax tree transform, or hand-built device cameras)
    fall back to per-leaf device-side checksums fetched in ONE transfer:
    hashing raw device bytes cost ~3 s PER ARRAY through the axon
    tunnel. Checksum collisions would need two scenes agreeing on both
    moments of every array - beyond the accidental-mismatch cases this
    guard exists for."""
    h = hashlib.sha256()
    h.update(json.dumps(cfg.__dict__, sort_keys=True).encode())
    known = getattr(scene, "content_hash", None)
    if known is not None:
        h.update(known.encode())
        trees = (camera,)
    else:
        trees = (scene, camera)
    device_leaves = []
    for leaf in jax.tree_util.tree_leaves(trees):
        h.update(str(getattr(leaf, "dtype", type(leaf).__name__)).encode())
        h.update(str(tuple(getattr(leaf, "shape", ()))).encode())
        if isinstance(leaf, (np.ndarray, np.generic, float, int)):
            h.update(np.asarray(leaf).tobytes())
        else:
            device_leaves.append(leaf)
    if device_leaves:
        sums = np.asarray(jax.jit(_leaf_checksums)(device_leaves))
        h.update(sums.tobytes())
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
