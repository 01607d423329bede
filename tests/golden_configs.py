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
    ]
