"""Octree mesh chunker: host-side (NumPy) geometry preprocessing.

Re-implements the semantics of MeshSplitter (Helpers/MeshSplitter.cs):

  * a sub-mesh becomes one chunk whose AABB starts as a 0.01-sized box at the
    first vertex and grows to encapsulate all triangle vertices
    (MeshSplitter.cs:35-63);
  * chunks with more than ``max_tris`` (48) triangles split recursively (depth
    limit 6) into 8 octants of half the parent size, centers at +/- size/4
    (MeshSplitter.cs:65-99, iteration order x,y,z in {-1,+1} nested);
  * a triangle is claimed by an octant if ANY of its vertices lies inside the
    octant box (inclusive bounds test), first-octant-wins
    (MeshSplitter.cs:101-124);
  * a child chunk's bounds start FROM the octant box and only grow when
    encapsulating claimed vertices - they never shrink below the octant
    (MeshSplitter.cs:104,115-117).

This runs offline at scene build (the reference caches it per mesh,
RayTracedMesh.cs:24-29), so plain NumPy is the right tool; the output feeds
the device-side MeshChunks buffers.
"""

from __future__ import annotations

import dataclasses

import numpy as np

MAX_DEPTH = 6  # MeshSplitter.cs:8
MAX_TRIS_PER_CHUNK = 48  # MeshSplitter.cs:9


@dataclasses.dataclass
class Chunk:
    """Host-side chunk (MeshChunk.cs:5-18): triangle vertex/normal arrays plus
    an AABB."""

    tri_pos: np.ndarray  # (n, 3, 3) f32 vertices (A, B, C)
    tri_normal: np.ndarray  # (n, 3, 3) f32 per-vertex normals
    bounds_min: np.ndarray  # (3,) f32
    bounds_max: np.ndarray  # (3,) f32


def _encapsulate(bmin, bmax, pts):
    return np.minimum(bmin, pts.min(axis=0)), np.maximum(bmax, pts.max(axis=0))


def create_chunks(
    tri_pos: np.ndarray,
    tri_normal: np.ndarray,
    max_tris: int = MAX_TRIS_PER_CHUNK,
    max_depth: int = MAX_DEPTH,
) -> list[Chunk]:
    """Split a triangle soup (n, 3, 3) into octree chunks of <= max_tris."""
    tri_pos = np.asarray(tri_pos, np.float32)
    tri_normal = np.asarray(tri_normal, np.float32)
    if tri_pos.shape[0] == 0:
        return []
    # Root bounds: Bounds(verts[0], 0.01) grown over all vertices
    # (MeshSplitter.cs:39,51-53).
    v0 = tri_pos[0, 0]
    bmin = v0 - 0.005
    bmax = v0 + 0.005
    bmin, bmax = _encapsulate(bmin, bmax, tri_pos.reshape(-1, 3))
    out: list[Chunk] = []
    _split(tri_pos, tri_normal, bmin, bmax, 0, max_tris, max_depth, out)
    return out


def _split(pos, nrm, bmin, bmax, depth, max_tris, max_depth, out):
    n = pos.shape[0]
    if n <= max_tris or depth >= max_depth:
        out.append(Chunk(pos, nrm, bmin.copy(), bmax.copy()))
        return
    center = (bmin + bmax) * 0.5
    q = (bmax - bmin) / 4.0
    taken = np.zeros(n, dtype=bool)
    # Octant iteration order matches MeshSplitter.cs:73-77 (x, y, z nested,
    # -1 then +1) so first-wins claims are identical.
    for sx in (-1.0, 1.0):
        for sy in (-1.0, 1.0):
            for sz in (-1.0, 1.0):
                if taken.all():
                    return
                oc = center + q * np.array([sx, sy, sz], np.float32)
                obmin = oc - q
                obmax = oc + q
                inside = (
                    (pos >= obmin) & (pos <= obmax)
                ).all(axis=2)  # (n, 3) per-vertex containment
                claim = inside.any(axis=1) & ~taken
                if not claim.any():
                    continue
                taken |= claim
                cpos = pos[claim]
                cnrm = nrm[claim]
                # Child bounds start from the octant box and grow
                # (MeshSplitter.cs:104,115-117).
                cbmin, cbmax = _encapsulate(
                    obmin.copy(), obmax.copy(), cpos.reshape(-1, 3)
                )
                _split(
                    cpos,
                    cnrm,
                    cbmin,
                    cbmax,
                    depth + 1,
                    max_tris,
                    max_depth,
                    out,
                )
