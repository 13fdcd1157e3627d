"""JSON scene format.

The reference hardcodes its entire scene in main() (src/main.rs:809-1083);
SURVEY.md §5.6 calls for a small JSON scene+render config exposing the same
authoring surface.  The format mirrors the builder DSL one-to-one:

{
  "camera": {"fovy_deg": 60, "center": [2,2.5,2], "toward": [-1,-1,-1],
              "up": [0,1,0], "near": -0.1},
  "objects": [
    {"material": {"diffuse_color": [1,0.8,0.6], "shiness": 0.5,
                   "smoothness": 0.01, "texture": "stripes", ...},
     "spheres": [{"center": [0,0.5,0], "radius": 0.5}],
     "triangles": [[[x,y,z],[x,y,z],[x,y,z]]],            # flat normals
     "squares":   [[[..4 corners..]]],                     # 2 tris each
     "obj": {"path": "mesh.obj", "scale": 0.333, "offset": [0.7,1,-0.5]}}
  ],
  "lights": [
    {"type": "directional", "direction": [-1,-1,0], "color": [1,0.98,0.95]},
    {"type": "spot", "origin": [0,10,0], "direction": [0,-1,0],
     "angle_deg": 60, "softness": 1, "color": [1,0.5,0.9]},
    {"type": "point", "origin": [0,0.1,0], "color": [0.8,0.8,1]}
  ]
}

Triangle/square vertices may be [x,y,z] or {"p": [x,y,z], "uv": [u,v]}.
Texture names resolve against scene/textures.DEFAULT_TEXTURES.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

from raytracer_tpu.scene.builder import MaterialSpec, SceneBuilder, square, triangle
from raytracer_tpu.scene.textures import DEFAULT_TEXTURES
from raytracer_tpu.scene.types import Camera, Scene


def _vertex(v):
    if isinstance(v, dict):
        return (v["p"], v.get("uv", (0.0, 0.0)))
    return (v, (0.0, 0.0))


def _material(spec: dict) -> MaterialSpec:
    tex = spec.get("texture", 0)
    if isinstance(tex, str):
        names = [t.name for t in DEFAULT_TEXTURES]
        if tex not in names:
            raise ValueError(f"unknown texture {tex!r}; have {names[1:]}")
        tex = names.index(tex)
    fields = dict(spec)
    fields["texture"] = tex
    allowed = {f for f in MaterialSpec.__dataclass_fields__}
    unknown = set(fields) - allowed
    if unknown:
        raise ValueError(f"unknown material fields: {sorted(unknown)}")
    return MaterialSpec(**fields)


def load_scene_dict(data: dict, base_dir: str = ".") -> Tuple[Scene, tuple, Optional[Camera]]:
    """Build (scene, textures, camera-or-None) from a parsed JSON dict."""
    b = SceneBuilder()
    for obj in data.get("objects", []):
        proxy = b.push_object(_material(obj.get("material", {})))
        for sph in obj.get("spheres", []):
            proxy.push_sphere(sph["center"], sph["radius"])
        for tri in obj.get("triangles", []):
            proxy.push_triangle(triangle([_vertex(v) for v in tri]))
        for sq in obj.get("squares", []):
            proxy.push_triangles(square([_vertex(v) for v in sq]))
        if "obj" in obj:
            from raytracer_tpu.utils.obj import load_obj_triangles

            spec = obj["obj"]
            scale = float(spec.get("scale", 1.0))
            offset = np.asarray(spec.get("offset", (0.0, 0.0, 0.0)), np.float32)
            path = spec["path"]
            if not os.path.isabs(path):
                path = os.path.join(base_dir, path)
            proxy.push_triangles(
                load_obj_triangles(path, transform=lambda p: p * scale + offset)
            )

    for light in data.get("lights", []):
        kind = light["type"]
        if kind == "directional":
            b.push_directional_light(light["direction"], light["color"])
        elif kind == "spot":
            b.push_spot_light(
                light["origin"], light["direction"],
                np.deg2rad(float(light["angle_deg"])),
                float(light.get("softness", 1.0)), light["color"],
            )
        elif kind == "point":
            b.push_point_light(light["origin"], light["color"])
        else:
            raise ValueError(f"unknown light type {kind!r}")

    camera = None
    if "camera" in data:
        c = data["camera"]
        camera = Camera.create(
            fovy_deg=float(c.get("fovy_deg", 60.0)),
            center=c["center"],
            toward=c["toward"],
            up=c.get("up", (0.0, 1.0, 0.0)),
            near=float(c.get("near", 0.0)),
        )

    use_bvh = data.get("bvh", "auto")
    return b.build(use_bvh=use_bvh), DEFAULT_TEXTURES, camera


def load_scene_file(path: str):
    """Load a JSON scene file -> (scene, textures, camera-or-None)."""
    with open(path) as f:
        data = json.load(f)
    return load_scene_dict(data, base_dir=os.path.dirname(os.path.abspath(path)))


def dump_builder(builder: SceneBuilder, camera: Optional[Camera] = None) -> dict:
    """Serialize a SceneBuilder (pre-build) back to the JSON format.

    Triangles are emitted as explicit vertex triples with uvs (winding
    normals are rebuilt on load), so dump -> load -> build reproduces the
    same Scene arrays.
    """
    from raytracer_tpu.scene.types import (
        LIGHT_DIRECTIONAL,
        LIGHT_POINT,
        LIGHT_SPOT,
    )

    objects = []
    for idx, mat in enumerate(builder._materials):
        tex = mat.texture
        entry: dict = {
            "material": {
                "diffuse_color": list(map(float, mat.diffuse_color)),
                "shiness": mat.shiness,
                "specular_color": list(map(float, mat.specular_color)),
                "smoothness": mat.smoothness,
                "transparency": mat.transparency,
                "refraction_index": mat.refraction_index,
                "opaque_decay": mat.opaque_decay,
                "normal": list(map(float, mat.normal)),
                "texture": DEFAULT_TEXTURES[tex].name if tex else 0,
            }
        }
        tris = [
            [
                {"p": [float(x) for x in v.position], "uv": [float(u) for u in v.uv]}
                for v in verts
            ]
            for obj_idx, verts in builder._triangles
            if obj_idx == idx
        ]
        if tris:
            entry["triangles"] = tris
        sphs = [
            {"center": [float(x) for x in c], "radius": r}
            for obj_idx, c, r in builder._spheres
            if obj_idx == idx
        ]
        if sphs:
            entry["spheres"] = sphs
        objects.append(entry)

    lights = []
    for l in builder._lights:
        if l["type"] == LIGHT_DIRECTIONAL:
            lights.append({"type": "directional",
                           "direction": [float(x) for x in l["direction"]],
                           "color": [float(x) for x in l["color"]]})
        elif l["type"] == LIGHT_SPOT:
            lights.append({"type": "spot",
                           "origin": [float(x) for x in l["origin"]],
                           "direction": [float(x) for x in l["direction"]],
                           "angle_deg": float(np.rad2deg(l["angle"])),
                           "softness": float(l["softness"]),
                           "color": [float(x) for x in l["color"]]})
        elif l["type"] == LIGHT_POINT:
            lights.append({"type": "point",
                           "origin": [float(x) for x in l["origin"]],
                           "color": [float(x) for x in l["color"]]})

    out: dict = {"objects": objects, "lights": lights}
    if camera is not None:
        out["camera"] = {
            "fovy_deg": float(np.rad2deg(np.asarray(camera.fovy))),
            "center": [float(x) for x in np.asarray(camera.center)],
            "toward": [float(x) for x in np.asarray(camera.toward)],
            "up": [float(x) for x in np.asarray(camera.up)],
            "near": float(np.asarray(camera.near)),
        }
    return out
