"""Alpha-MASK cutoff (glTF ``material.alphaMode = MASK``).

The reference's live path draws MASK materials opaque (its pipeline cache
only distinguishes opaque/blend, ``GraphicsPipelineCache.cpp``); glTF
semantics say fragments with sampled alpha < ``material.alphaCutoff`` are
discarded so the surface behind shows through. ``RenderConfig.alpha_mask``
enables the glTF-correct peeled cutoff pass (``graph/frame.py``); off (the
default) keeps reference parity.
"""

import numpy as np

from renderengine_tpu.core import math3d
from renderengine_tpu.core.aabb import AABB
from renderengine_tpu.core.config import RenderConfig
from renderengine_tpu.graph.frame import FrameRenderer
from renderengine_tpu.scene import procedural
from renderengine_tpu.scene.lights import Light, LightType
from renderengine_tpu.scene.materials import (AlphaMode, MaterialInstanceInfo,
                                              MaterialProperties)
from renderengine_tpu.scene.scene import Scene

W, H = 128, 96


def hole_texture(size=64, tiles=2):
    """White RGBA texture whose alpha is a checkerboard of 0/255 blocks
    (big blocks so mips/bilinear can't blur the test pixels)."""
    t = np.full((size, size, 4), 255, np.uint8)
    yy, xx = np.mgrid[0:size, 0:size]
    cell = size // tiles
    t[..., 3] = np.where(((yy // cell) + (xx // cell)) % 2 == 0, 255, 0)
    return t


def mask_scene(n_mask_quads=1, blocker=False):
    """Green opaque backdrop + emissive-white MASK quad(s) with a
    checkerboard-alpha texture between camera and backdrop. Camera looks
    straight down -z at the quad centers. With two quads the second's
    alpha pattern is inverted, so a hole in the first shows the second
    (exercises mask_layers >= 2). ``blocker``: an opaque plate in FRONT
    of the mask quads on the left half (depth test must hide them)."""
    sc = Scene()
    back = sc.materials.create_material_instance(MaterialInstanceInfo(
        MaterialProperties(base_color=np.array([0, 1, 0, 1], np.float32),
                           emissive=np.array([0, 1, 0, 1], np.float32))))
    hole = sc.textures.add_texture(hole_texture(), key="hole")
    inv = sc.textures.add_texture(
        np.concatenate([hole_texture()[..., :3],
                        255 - hole_texture()[..., 3:]], -1), key="inv")
    masks = []
    for q, tex in enumerate([hole, inv][:n_mask_quads]):
        masks.append(sc.materials.create_material_instance(
            MaterialInstanceInfo(
                MaterialProperties(base_color=np.ones(4, np.float32),
                                   emissive=np.array([1, 1, 1, 1], np.float32),
                                   base_color_texture=tex),
                alpha_mode=AlphaMode.MASK, alpha_cutoff=0.5)))
    blk = sc.materials.create_material_instance(MaterialInstanceInfo(
        MaterialProperties(base_color=np.array([0, 0, 1, 1], np.float32),
                           emissive=np.array([0, 0, 1, 1], np.float32))))

    p, n, u, i = procedural.make_plane(half=2.0, normal_axis=2)

    def add(mat, z, pts=2.0, xoff=0.0):
        node = sc.tree.create_node(
            np.array([[1, 0, 0, xoff], [0, 1, 0, 0], [0, 0, 1, z],
                      [0, 0, 0, 1]], np.float32),
            AABB.from_points([[-pts, -pts, 0], [pts, pts, 0]]))
        base = sc.meshes.add_vertices(p, n, u)
        sc.meshes.add_mesh(i + base, mat, node)

    add(back, -1.0)                        # backdrop
    for q, m in enumerate(masks):          # mask quads, nearest first
        add(m, 0.0 + 0.2 * q)
    if blocker:
        add(blk, 0.8, xoff=-2.0)           # covers the left half, in front

    sc.lights.add_light(Light(type=LightType.DIRECTIONAL,
                              color=np.ones(3, np.float32),
                              direction=math3d.normalize([0.0, 0.0, -1.0]),
                              intensity=1.0))
    sc.camera = procedural.Camera(
        eye=np.array([0, 0, 3.0], np.float32),
        look_at=np.zeros(3, np.float32),
        up=np.array([0, 1, 0], np.float32),
        fov_degrees=60.0, near=0.1, far=100.0,
        width=W, height=H, exposure=1.0)
    return sc


CFG = RenderConfig(width=W, height=H, shadows=False, skybox=False,
                   translucency=False)

# central region safely inside every quad (quads span +-2 world units;
# at fov 60 / z=3 the view half-height at the quad plane is ~1.7, so the
# middle half of the frame is all quad). Probes are region fractions —
# robust to uv flip conventions and bilinear edges.
def _center(img):
    return img[H // 4 : 3 * H // 4, W // 2 - W // 5 : W // 2 + W // 5, :3]


def _frac_green(r):
    return float(((r[..., 1] > 150) & (r[..., 0] < 100)).mean())


def _frac_white(r):
    return float((r.min(axis=-1) > 150).mean())


class TestAlphaMask:
    def test_off_draws_opaque(self):
        """Default (reference parity): MASK draws opaque — no holes, the
        whole center is the white quad."""
        img = np.asarray(FrameRenderer(mask_scene(), CFG,
                                       backend="tiled").render())
        assert _frac_white(_center(img)) > 0.98, _frac_white(_center(img))

    def test_cutoff_opens_holes(self):
        """Cutoff on: the checkerboard alpha opens holes showing the green
        backdrop — roughly half the center each."""
        img = np.asarray(FrameRenderer(
            mask_scene(), CFG.replace(alpha_mask=True),
            backend="tiled").render())
        r = _center(img)
        assert 0.2 < _frac_green(r) < 0.8, _frac_green(r)
        assert 0.2 < _frac_white(r) < 0.8, _frac_white(r)

    def test_second_layer_shows_through(self):
        """Quad 2 (inverted pattern) fills quad 1's holes — visible only
        if the SECOND peel layer runs; with mask_layers=1 the holes fall
        back to the green backdrop."""
        img2 = np.asarray(FrameRenderer(
            mask_scene(n_mask_quads=2), CFG.replace(alpha_mask=True),
            backend="tiled").render())
        assert _frac_white(_center(img2)) > 0.9, _frac_white(_center(img2))
        img1 = np.asarray(FrameRenderer(
            mask_scene(n_mask_quads=2),
            CFG.replace(alpha_mask=True, mask_layers=1),
            backend="tiled").render())
        assert _frac_green(_center(img1)) > 0.2, _frac_green(_center(img1))

    def test_depth_hides_masked_quads(self):
        """An opaque plate in front occludes MASK quads behind it."""
        img = np.asarray(FrameRenderer(
            mask_scene(blocker=True), CFG.replace(alpha_mask=True),
            backend="tiled").render())
        left = img[H // 2, W // 8, :3].astype(np.int32)
        assert left[2] > 150 and left[1] < 100, left  # blue blocker

    def test_backend_parity(self):
        a = np.asarray(FrameRenderer(
            mask_scene(n_mask_quads=2), CFG.replace(alpha_mask=True),
            backend="tiled").render()).astype(np.int32)
        b = np.asarray(FrameRenderer(
            mask_scene(n_mask_quads=2), CFG.replace(alpha_mask=True),
            backend="reference").render()).astype(np.int32)
        diff = np.abs(a - b).max(axis=-1)
        assert float((diff <= 1).mean()) > 0.995, float((diff <= 1).mean())

    def test_gltf_roundtrip_cutoff(self):
        """glTF alphaCutoff lands in the material table."""
        from renderengine_tpu.scene.materials import MaterialSystem
        ms = MaterialSystem()
        ms.create_material_instance(MaterialInstanceInfo(
            MaterialProperties(), alpha_mode=AlphaMode.MASK,
            alpha_cutoff=0.75))
        arrs = ms.build_arrays()
        assert arrs["mat_alpha_cutoff"][0] == np.float32(0.75)
        assert arrs["mat_alpha_mode"][0] == int(AlphaMode.MASK)
