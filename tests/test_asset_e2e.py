"""Real-asset end-to-end paths (VERDICT r3 #8): actual image FILES through
the native decoders into rendered frames, and a full-texture glTF written
to disk, loaded, and rendered — the reference's file -> assimp -> frame
pipeline (``AssimpSceneLoader.cpp:61-92``, ``TextureCache.cpp:199-291``).

NOTE on the reference's own skybox JPEGs: ``/root/reference`` ships them
as git-lfs POINTER STUBS (131-byte "version https://git-lfs..." text
files), so the literal assets are unobtainable in this environment. The
skybox test therefore encodes real JPEG faces with Pillow (an independent
libjpeg encoder) and feeds them through the same load_cubemap_faces ->
native decode_jpeg -> frame path the reference assets would take. The
only REAL binary asset in the snapshot, ``dummy_texture.png``, is decoded
too."""

import json
import struct

import numpy as np
import pytest

from renderengine_tpu.core.config import RenderConfig
from renderengine_tpu.graph.frame import FrameRenderer
from renderengine_tpu.scene import procedural
from renderengine_tpu.scene.scene import Scene

REF_DUMMY = "/root/reference/Assets/Textures/dummy_texture.png"


class TestReferencePng:
    def test_reference_dummy_texture_decodes(self):
        """The one real binary asset in the reference snapshot."""
        import os
        if not os.path.exists(REF_DUMMY):
            pytest.skip("reference assets not present")
        from renderengine_tpu.utils.image import read_image
        img = read_image(REF_DUMMY)
        assert img.ndim == 3 and img.shape[2] in (3, 4)
        assert img.size > 0


class TestSkyboxJpegE2E:
    def test_six_jpeg_faces_to_frame(self, tmp_path):
        pytest.importorskip("PIL")
        from PIL import Image

        from renderengine_tpu.native import load_library
        if load_library() is None:
            pytest.skip("native library unavailable")

        # six distinct-color 64x64 faces, written as REAL baseline JPEGs
        # in the reference's file layout (Skybox.cpp:71-79 face order)
        colors = [(200, 40, 40), (40, 200, 40), (40, 40, 200),
                  (200, 200, 40), (200, 40, 200), (40, 200, 200)]
        names = ["right", "left", "top", "bottom", "front", "back"]
        paths = []
        for name, c in zip(names, colors):
            img = np.full((64, 64, 3), c, np.uint8)
            p = tmp_path / f"{name}.jpg"
            Image.fromarray(img).save(str(p), "JPEG", quality=95)
            paths.append(str(p))

        sc = procedural.cube_scene(textured=True, width=96, height=72)
        sc.textures.load_cubemap_faces(paths)   # +x,-x,+y,-y,+z,-z
        # decoded faces match the encoded colors within JPEG tolerance
        cm = sc.textures.cubemap
        assert cm.shape == (6, 64, 64, 4)
        for f, c in enumerate(colors):
            d = np.abs(cm[f, :, :, :3].astype(int) - np.asarray(c))
            assert d.max() <= 8, f"face {f} off by {d.max()}"

        cfg = RenderConfig(width=96, height=72, shadows=False,
                           translucency=False)
        img = np.asarray(FrameRenderer(sc, cfg).render())
        # the camera at (2.5, 2, 2.5) looks toward (-1,-1,-1): the sky
        # behind the cube is the -x (left, green) and -z (back, cyan)
        # faces — green channel dominates both corners, and the right
        # corner carries the cyan blue component the left one lacks
        ul = img[0, 0, :3].astype(int)
        ur = img[0, -1, :3].astype(int)
        assert ul[1] > ul[0] and ul[1] > ul[2], f"-x face not green: {ul}"
        assert ur[1] > ur[0] and ur[2] > ul[2] + 40, \
            f"-z face not cyan: {ur} vs {ul}"


def _write_full_texture_gltf(tmp_path):
    """A quad with a material carrying ALL four texture slots, textures
    as PNG files on disk, geometry in a .bin buffer."""
    from renderengine_tpu.utils.png import write_png

    rng = np.random.default_rng(3)
    base = procedural.checker_texture(64, tiles=4, c0=(230, 210, 160),
                                      c1=(80, 50, 40))
    nrm = procedural.normal_map_texture(64, rng, strength=2.0)
    orm = procedural.orm_texture(64, rng)
    emi = procedural.emissive_texture(64, rng, color=(255, 140, 60),
                                      glow=0.3)
    for name, img in (("base", base), ("nrm", nrm), ("orm", orm),
                      ("emi", emi)):
        write_png(str(tmp_path / f"{name}.png"), img)

    # quad in the xz plane facing +y, uvs over [0,1]^2 (v as stored in
    # the FILE; the loader applies the reference's v flip)
    pos = np.array([[-1, 0, 1], [1, 0, 1], [1, 0, -1], [-1, 0, -1]],
                   np.float32)
    nor = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    blob = (pos.tobytes() + nor.tobytes() + uv.tobytes() + idx.tobytes())
    (tmp_path / "geom.bin").write_bytes(blob)

    gltf = {
        "asset": {"version": "2.0"},
        "buffers": [{"uri": "geom.bin", "byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4,
             "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
        "images": [{"uri": "base.png"}, {"uri": "nrm.png"},
                   {"uri": "orm.png"}, {"uri": "emi.png"}],
        "textures": [{"source": i} for i in range(4)],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorFactor": [1, 1, 1, 1],
                "metallicFactor": 0.2, "roughnessFactor": 0.7,
                "baseColorTexture": {"index": 0},
                "metallicRoughnessTexture": {"index": 2},
            },
            "normalTexture": {"index": 1},
            "emissiveTexture": {"index": 3},
            "emissiveFactor": [1, 1, 1],
        }],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0}]}],
        "nodes": [{"mesh": 0}],
        "scenes": [{"nodes": [0]}],
        "scene": 0,
    }
    gp = tmp_path / "full.gltf"
    gp.write_text(json.dumps(gltf))
    return gp, (base, nrm, orm, emi), (pos, nor, uv,
                                       idx.astype(np.uint32))


class TestGltfFullTextureE2E:
    def test_disk_gltf_matches_in_memory_twin(self, tmp_path):
        """File -> loader -> frame must render IDENTICALLY to the same
        scene constructed directly through the engine API (the loader
        adds no semantics of its own)."""
        from renderengine_tpu.core import math3d
        from renderengine_tpu.core.aabb import AABB
        from renderengine_tpu.scene.camera import Camera
        from renderengine_tpu.scene.lights import Light, LightType
        from renderengine_tpu.scene.loader import load_scene
        from renderengine_tpu.scene.materials import (
            MaterialInstanceInfo, MaterialProperties)

        gp, (base, nrm, orm, emi), (pos, nor, uv, idx) = \
            _write_full_texture_gltf(tmp_path)

        def finish(sc):
            sc.lights.add_light(Light(
                type=LightType.DIRECTIONAL, color=np.ones(3, np.float32),
                direction=math3d.normalize([-0.3, -1.0, -0.4]),
                intensity=3.0))
            sc.camera = Camera(eye=np.array([0, 2.0, 2.5], np.float32),
                               look_at=np.zeros(3, np.float32),
                               up=np.array([0, 1, 0], np.float32),
                               fov_degrees=50.0, near=0.1, far=50.0,
                               width=96, height=72, exposure=1.0)
            return sc

        loaded = finish(load_scene(str(gp)))

        twin = Scene()
        th = [twin.textures.add_texture(img, key=f"t{i}")
              for i, img in enumerate((base, nrm, orm, emi))]
        mat = twin.materials.create_material_instance(MaterialInstanceInfo(
            MaterialProperties(
                base_color=np.ones(4, np.float32),
                emissive=np.array([1, 1, 1, 1], np.float32),
                metallic=0.2, perceptual_roughness=0.7,
                base_color_texture=th[0], normals_texture=th[1],
                orm_texture=th[2], emissive_texture=th[3])))
        node = twin.tree.create_node(np.eye(4, dtype=np.float32),
                                     AABB.from_points(pos))
        vb = twin.meshes.add_vertices(pos, nor,
                                      uv * np.array([1, -1], np.float32))
        twin.meshes.add_mesh(idx + vb, mat, node)
        finish(twin)

        cfg = RenderConfig(width=96, height=72, shadows=False,
                           skybox=False, translucency=False)
        a = np.asarray(FrameRenderer(loaded, cfg, backend="tiled").render())
        b = np.asarray(FrameRenderer(twin, cfg, backend="tiled").render())
        np.testing.assert_array_equal(a, b)
        # and the frame actually shows the texture content (non-trivial)
        assert a[..., :3].std() > 10
        # all four slots live in the loaded scene
        p = loaded.materials.instances[0].properties
        assert (p.base_color_texture >= 0 and p.normals_texture >= 0
                and p.orm_texture >= 0 and p.emissive_texture >= 0)
