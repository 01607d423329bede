"""The five BASELINE milestone configs as small, CPU-renderable scenes.

Shared by ``tools/make_goldens.py`` (renders them with the brute-force
``reference`` backend and freezes the PNGs under ``tests/goldens/``) and
``tests/test_golden.py`` (asserts the production backends still match).

Resolutions are deliberately tiny: the harness certifies *correctness*
(BASELINE.md "pixel-matching the Vulkan reference"); speed is bench.py's
job. Scenes are seeded + procedural, so goldens regenerate bit-exactly.
"""

from __future__ import annotations

from renderengine_tpu.core.config import RenderConfig, ShadingModel


def golden_cases():
    """[(name, scene_factory, RenderConfig)] for BASELINE configs 1-5."""
    from renderengine_tpu.scene import procedural

    w, h = 128, 96

    def cube():
        return procedural.cube_scene(textured=True, width=w, height=h)

    def multimesh():
        return procedural.sponza_scene(width=w, height=h, n_textures=8,
                                       target_tris=1_500)

    def bindless():
        return procedural.sponza_scene(width=w, height=h, n_textures=48,
                                       target_tris=2_000)

    def normal_orm():
        return material_showcase_scene(width=w, height=h)

    base = RenderConfig(width=w, height=h, shadow_extent=128)
    return [
        # 1. single textured cube, one directional Phong light
        ("cube_phong", cube,
         base.replace(shading=ShadingModel.PHONG, shadows=False,
                      skybox=False, translucency=False)),
        # 2. multi-mesh scene, per-object materials, depth-tested opaque
        ("multimesh_opaque", multimesh,
         base.replace(shadows=False, skybox=False, translucency=False)),
        # 3. bindless material system: many textures
        ("bindless_textures", bindless,
         base.replace(shadows=False, skybox=False, translucency=False)),
        # 4. directional shadow mapping (depth pass + PCF) over full scene
        ("shadows_pcf", bindless,
         base.replace(skybox=False, translucency=False)),
        # 5. skybox cubemap + full frame loop config (translucency on)
        ("skybox_full", bindless, base),
        # 6. (beyond reference) diffuse irradiance from the environment
        # cube consumed in lighting — the reference's pbr.glsl:442 todo
        ("ibl_diffuse", bindless,
         base.replace(shadows=False, translucency=False, ibl_diffuse=True)),
        # 7. the FULL material model on one frame: normal mapping (TBN
        # from screen derivatives, pbr.glsl:121-145), packed ORM, emissive
        # texture — plus a grazing-angle floor (the mip/aniso stress case)
        ("normal_orm", normal_orm,
         base.replace(shadows=False, skybox=False, translucency=False)),
    ]


def material_showcase_scene(width=128, height=96):
    """Sphere + grazing floor, every texture slot wired: base color,
    tangent-space normal map, occlusion/roughness/metallic, emissive
    (``MaterialSystem.h:41-51``; sampling per ``pbr.glsl:100-160``)."""
    import numpy as np

    from renderengine_tpu.core import math3d
    from renderengine_tpu.core.aabb import AABB
    from renderengine_tpu.scene import procedural
    from renderengine_tpu.scene.camera import Camera
    from renderengine_tpu.scene.lights import Light, LightSystem, LightType
    from renderengine_tpu.scene.materials import (
        MaterialInstanceInfo, MaterialProperties)
    from renderengine_tpu.scene.scene import Scene

    rng = np.random.default_rng(7)
    sc = Scene()
    tb = sc.textures.add_texture(
        procedural.checker_texture(128, tiles=6, c0=(220, 200, 170),
                                   c1=(90, 60, 40)), key="base")
    tn = sc.textures.add_texture(
        procedural.normal_map_texture(128, rng, strength=2.5), key="nrm")
    to = sc.textures.add_texture(procedural.orm_texture(128, rng), key="orm")
    te = sc.textures.add_texture(
        procedural.emissive_texture(128, rng, color=(255, 120, 40),
                                    glow=0.3), key="em")
    full = sc.materials.create_material_instance(MaterialInstanceInfo(
        MaterialProperties(base_color=np.ones(4, np.float32),
                           emissive=np.array([1, 1, 1, 1], np.float32),
                           perceptual_roughness=0.8, metallic=0.1,
                           base_color_texture=tb, normals_texture=tn,
                           orm_texture=to, emissive_texture=te)))
    floor = sc.materials.create_material_instance(MaterialInstanceInfo(
        MaterialProperties(base_color=np.ones(4, np.float32),
                           perceptual_roughness=0.5,
                           base_color_texture=tb, normals_texture=tn,
                           orm_texture=to)))

    def add(geo, tf, mat, pts):
        p, n, u, i = geo
        node = sc.tree.create_node(tf, AABB.from_points(pts))
        base = sc.meshes.add_vertices(p, n, u)
        sc.meshes.add_mesh(i + base, mat, node)

    add(procedural.make_uv_sphere(1.0, stacks=24, slices=48),
        math3d.translate([0, 1.0, 0]), full,
        [[-1, -1, -1], [1, 1, 1]])
    # long grazing floor: screen-space uv derivatives sweep many mip
    # levels front-to-back (the anisotropic-footprint stress case)
    add(procedural.make_plane(0.5),
        math3d.scale([30, 1, 30]), floor,
        [[-0.5, 0, -0.5], [0.5, 0, 0.5]])
    sc.lights.add_light(Light(type=LightType.DIRECTIONAL,
                              color=np.ones(3, np.float32),
                              direction=math3d.normalize([-0.4, -1.0, -0.2]),
                              intensity=3.0))
    sc.camera = Camera(eye=np.array([0.0, 1.2, 4.5], np.float32),
                       look_at=np.array([0.0, 0.8, 0.0], np.float32),
                       up=np.array([0, 1, 0], np.float32),
                       fov_degrees=50.0, near=0.1, far=100.0,
                       width=width, height=height, exposure=1.0)
    return sc
