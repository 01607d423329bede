"""Directional-light shadow frustum fitting (host-side, per frame).

Port of the *intended* behavior of ``ShadowSystem.cpp:129-204``
(``ComputeDirectionalLightViewMatrix`` + ``ComputeShadowTransform``):

1. camera frustum corners -> world AABB
2. extend toward the light to the scene's depth so off-screen casters are
   kept (near plane pushed to the farthest object along -z in light space)
3. union the world AABBs of objects intersecting that extended box
4. fit an ortho projection over the union in light view space

The reference's uninitialized-``up`` UB (SURVEY.md quirk list) is replaced
by the correct orthobasis from ``core.math3d.directional_light_view``.
"""

from __future__ import annotations

import numpy as np

from ..core import math3d
from ..core.aabb import AABB


def compute_shadow_transform(light_direction, camera, scene_box: AABB,
                             boxes: list[AABB], transforms: list[np.ndarray]):
    """Returns (shadow_view [4,4], shadow_proj [4,4]); the shader-facing
    MaterialShadowData.transform is ``shadow_proj @ shadow_view``."""
    cam_pts = camera.frustum_corners()
    cam_box_world = AABB.from_points(cam_pts)

    shadow_view = math3d.directional_light_view(light_direction)
    cam_box_view = cam_box_world.transform(shadow_view)
    scene_box_view = scene_box.transform(shadow_view)

    # keep all potential casters: bring the near plane (light looks -z) to
    # the farthest scene extent in the light direction
    if not scene_box_view.is_empty() and not cam_box_view.is_empty():
        cam_box_view.max[2] = scene_box_view.max[2]
    cam_box_world = cam_box_view.transform(np.linalg.inv(shadow_view).astype(np.float32))

    light_box_world = AABB()
    for box_local, tf in zip(boxes, transforms):
        box_world = box_local.transform(tf)
        if box_world.intersects(cam_box_world):
            light_box_world = light_box_world.union(box_world)
    if light_box_world.is_empty():
        light_box_world = scene_box if not scene_box.is_empty() else AABB.from_points([[-1, -1, -1], [1, 1, 1]])

    lb = light_box_world.transform(shadow_view)
    proj = math3d.ortho_vk(lb.min[0], lb.max[0], lb.min[1], lb.max[1], lb.min[2], lb.max[2])
    return shadow_view, proj


def shadow_transforms_for_scene(scene, extent_unused: int = 0) -> np.ndarray:
    """[NS,4,4] proj@view per shadow map (NS >= 1; identity rows for unused
    slots so shapes stay static)."""
    ns = max(1, scene.n_shadow_maps)
    out = np.tile(np.eye(4, dtype=np.float32), (ns, 1, 1))
    boxes, transforms = scene.node_world_aabbs()
    sbox = scene.scene_aabb()
    for light in scene.lights.lights:
        if light.shadow_index is None or light.shadow_index < 0:
            continue
        view, proj = compute_shadow_transform(light.direction, scene.camera, sbox,
                                              boxes, transforms)
        out[light.shadow_index] = (proj @ view).astype(np.float32)
    return out
