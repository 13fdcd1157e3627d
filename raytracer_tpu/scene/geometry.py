"""Procedural solids.

The reference ships a dodecahedron.obj asset (20 vertices normalized to the
unit sphere, 12 pentagons fan-triangulated to 36 faces).  That solid has a
closed form, so we generate it instead of shipping a copied asset: vertices
{(±1,±1,±1), (0,±1/φ,±φ), (±1/φ,±φ,0), (±φ,0,±1/φ)} / √3.  Because every
pentagon is planar and the renderer uses flat winding normals
(src/main.rs:730-739), any fan triangulation renders identically.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

from raytracer_tpu.scene.builder import Vertex, triangle

PHI = (1.0 + np.sqrt(5.0)) / 2.0


def dodecahedron_vertices() -> np.ndarray:
    """[20, 3] vertices of a regular dodecahedron with circumradius 1."""
    verts = []
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                verts.append((sx, sy, sz))
    # Edge-vertex family in the same chirality as the reference asset
    # (/root/reference/dodecahedron.obj: cyclic (phi, 1/phi, 0) — the
    # mirror family renders the solid in a different orientation).
    for s1 in (-1, 1):
        for s2 in (-1, 1):
            verts.append((0.0, s1 * PHI, s2 / PHI))
            verts.append((s1 / PHI, 0.0, s2 * PHI))
            verts.append((s1 * PHI, s2 / PHI, 0.0))
    v = np.asarray(verts, dtype=np.float64)
    return (v / np.sqrt(3.0)).astype(np.float32)


def dodecahedron_faces() -> List[List[int]]:
    """12 pentagons as vertex-index rings, wound outward (CCW from outside)."""
    v = dodecahedron_vertices().astype(np.float64)
    # Face centers point along icosahedron vertex directions; for THIS
    # dodecahedron orientation the matching chirality is (0, ±1, ±phi)
    # cyclic (the other family bisects edges instead — the five face
    # vertices then do not share their dot product with u).
    dirs = []
    for s1 in (-1, 1):
        for s2 in (-1, 1):
            dirs.append((0.0, s1, s2 * PHI))
            dirs.append((s1, s2 * PHI, 0.0))
            dirs.append((s1 * PHI, 0.0, s2))
    faces = []
    for u in np.asarray(dirs, dtype=np.float64):
        u = u / np.linalg.norm(u)
        score = v @ u
        idx = np.argsort(-score)[:5]
        # Sort the 5 face vertices by angle around u.
        center = v[idx].mean(axis=0)
        e1 = v[idx[0]] - center
        e1 -= u * (e1 @ u)
        e1 /= np.linalg.norm(e1)
        e2 = np.cross(u, e1)
        ang = np.arctan2((v[idx] - center) @ e2, (v[idx] - center) @ e1)
        ring = [int(i) for i in idx[np.argsort(ang)]]
        faces.append(ring)
    return faces


def dodecahedron_triangles(
    transform: Optional[Callable[[np.ndarray], np.ndarray]] = None,
) -> List[List[Vertex]]:
    """Fan-triangulated dodecahedron with flat winding normals, uv=(0,0)."""
    v = dodecahedron_vertices()
    tris: List[List[Vertex]] = []
    for ring in dodecahedron_faces():
        for k in range(1, 4):
            pts = []
            for i in (ring[0], ring[k], ring[k + 1]):
                p = v[i]
                if transform is not None:
                    p = np.asarray(transform(p), np.float32)
                pts.append((p, (0.0, 0.0)))
            tris.append(triangle(pts))
    return tris


def write_dodecahedron_obj(path: str) -> None:
    """Emit the generated solid as an OBJ asset (for the loader path)."""
    v = dodecahedron_vertices()
    lines = ["# generated regular dodecahedron (circumradius 1)", "g dodecahedron"]
    for p in v:
        lines.append(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}")
    for ring in dodecahedron_faces():
        for k in range(1, 4):
            a, b, c = ring[0] + 1, ring[k] + 1, ring[k + 1] + 1
            lines.append(f"f {a} {b} {c}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
