"""Scene loaders (OBJ/MTL, glTF), project files, camera controller, PNG io."""

import base64
import json

import numpy as np
import pytest

from renderengine_tpu.scene.loader import load_scene
from renderengine_tpu.scene.loader_obj import load_obj
from renderengine_tpu.scene.loader_gltf import load_gltf
from renderengine_tpu.scene.camera_controller import CameraController
from renderengine_tpu.scene.camera import Camera
from renderengine_tpu.scene.input import InputSystem, KeyAction
from renderengine_tpu.scene.materials import AlphaMode, material_handle_index
from renderengine_tpu.apps.project import ProjectSettings, ProjectWizard
from renderengine_tpu.utils import png


class TestObj:
    def test_obj_with_mtl(self, tmp_path):
        (tmp_path / "box.mtl").write_text(
            "newmtl red\nKd 1 0 0\nNs 50\nNi 1.5\nd 0.5\n")
        (tmp_path / "tri.obj").write_text(
            "mtllib box.mtl\n"
            "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
            "vn 0 0 1\nvt 0 0\nvt 1 0\nvt 0 1\n"
            "usemtl red\n"
            "f 1/1/1 2/2/1 3/3/1\n")
        sc = load_obj(tmp_path / "tri.obj")
        assert sc.meshes.triangle_count == 1
        pos, nrm, uv, vert_node, tri_vidx, tri_mat, _ = sc.meshes.build_arrays()
        assert pos.shape == (3, 3)
        # v flip (reference AssimpSceneLoader.cpp:231)
        assert uv[2, 1] == -1.0
        mi = material_handle_index(int(tri_mat[0]))
        inst = sc.materials.instances[mi]
        assert inst.alpha_mode == AlphaMode.BLEND  # d 0.5
        assert np.allclose(inst.properties.base_color[:3], [1, 0, 0])
        assert inst.properties.f0 == pytest.approx(0.04, rel=0.01)

    def test_obj_quad_triangulation_and_negative_indices(self, tmp_path):
        (tmp_path / "q.obj").write_text(
            "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
            "f -4 -3 -2 -1\n")
        sc = load_obj(tmp_path / "q.obj")
        assert sc.meshes.triangle_count == 2


def _minimal_gltf(tmp_path):
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    blob = pos.tobytes() + idx.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"mesh": 0, "translation": [1, 2, 3]},
            {"extensions": {"KHR_lights_punctual": {"light": 0}},
             "rotation": [0, 0, 0, 1]},
        ],
        "extensions": {"KHR_lights_punctual": {"lights": [
            {"type": "directional", "color": [2.0, 1.0, 1.0], "intensity": 3.0}
        ]}},
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0},
            "indices": 1,
            "material": 0,
        }]}],
        "materials": [{
            "pbrMetallicRoughness": {"baseColorFactor": [0.5, 0.25, 1.0, 1.0],
                                     "metallicFactor": 0.0,
                                     "roughnessFactor": 0.8},
            "alphaMode": "OPAQUE",
        }],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6},
        ],
        "buffers": [{
            "byteLength": len(blob),
            "uri": "data:application/octet-stream;base64," + base64.b64encode(blob).decode(),
        }],
    }
    p = tmp_path / "tri.gltf"
    p.write_text(json.dumps(gltf))
    return p


class TestGltf:
    def test_minimal_gltf(self, tmp_path):
        sc = load_gltf(_minimal_gltf(tmp_path))
        assert sc.meshes.triangle_count == 1
        assert len(sc.tree) == 1
        # node translation is baked into the world transform
        assert np.allclose(sc.tree.transforms[0][:3, 3], [1, 2, 3])
        # light: reference normalization (max channel 2*3=6 -> color/6,
        # intensity 10*6/683)
        l = sc.lights.lights[0]
        assert l.intensity == pytest.approx(10.0 * 6.0 / 683.0)
        assert np.allclose(l.color, [1.0, 0.5, 0.5])
        assert l.shadow_index == 0  # directional lights get shadow maps
        m = sc.materials.instances[material_handle_index(0)]
        assert np.allclose(m.properties.base_color, [0.5, 0.25, 1.0, 1.0])


class TestController:
    def test_orbit_drag_rotates_eye(self):
        cam = Camera(eye=np.array([0, 0, 5], np.float32))
        ctl = CameraController(cam, viewport=(100, 100))
        inp = InputSystem()
        inp.on_mouse_button("right", True)
        inp.on_cursor(50, 50)
        inp.end_frame()
        inp.on_cursor(60, 50)  # horizontal drag
        moved = ctl.update(0.016, inp.get_frame_inputs())
        assert moved
        assert not np.allclose(cam.eye, [0, 0, 5])
        assert np.linalg.norm(cam.eye) == pytest.approx(5.0, rel=1e-4)

    def test_f_toggles_and_restores(self):
        cam = Camera(eye=np.array([0, 0, 5], np.float32))
        ctl = CameraController(cam, viewport=(100, 100))
        inp = InputSystem()
        inp.on_key("f", KeyAction.PRESSED)
        ctl.update(0.016, inp.get_frame_inputs())
        assert ctl.mode == ctl.FREE
        inp.end_frame()
        # fly forward
        inp.on_key("w", KeyAction.PRESSED)
        ctl.update(0.5, inp.get_frame_inputs())
        assert cam.eye[2] < 5.0
        inp.end_frame()
        inp.on_key("f", KeyAction.PRESSED)
        ctl.update(0.016, inp.get_frame_inputs())
        assert ctl.mode == ctl.ORBIT
        assert np.allclose(cam.eye, [0, 0, 5])

    def test_scroll_zoom_clamped(self):
        cam = Camera()
        ctl = CameraController(cam, viewport=(100, 100))
        inp = InputSystem()
        for _ in range(30):
            inp.on_scroll(0, 5)
            ctl.update(0.016, inp.get_frame_inputs())
            inp.end_frame()
        assert cam.fov_degrees == 30.0


class TestProject:
    def test_wizard_roundtrip(self, tmp_path):
        settings = ProjectWizard.create_new_project(tmp_path / "proj", "MyGame")
        assert (tmp_path / "proj" / "MyGame.rproj").exists()
        assert (tmp_path / "proj" / "Assets").is_dir()
        loaded = ProjectSettings.from_file(tmp_path / "proj" / "MyGame.rproj")
        assert loaded.project_name == "MyGame"
        assert loaded.assets_dir == settings.assets_dir


class TestPngIO:
    def test_roundtrip(self, tmp_path, rng):
        img = rng.integers(0, 255, (33, 47, 4), dtype=np.uint8)
        png.write_png(str(tmp_path / "x.png"), img)
        back = png.read_png(str(tmp_path / "x.png"))
        np.testing.assert_array_equal(img, back)

    def test_rgb_and_gray(self, tmp_path, rng):
        img = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        png.write_png(str(tmp_path / "rgb.png"), img)
        np.testing.assert_array_equal(png.read_png(str(tmp_path / "rgb.png")), img)
        g = rng.integers(0, 255, (8, 8), dtype=np.uint8)
        png.write_png(str(tmp_path / "g.png"), g)
        np.testing.assert_array_equal(png.read_png(str(tmp_path / "g.png"))[..., 0], g)


class TestGlb:
    def test_glb_container(self, tmp_path):
        import struct
        from renderengine_tpu.scene.loader_gltf import load_gltf

        # wrap a minimal gltf (external-buffer-free) into a GLB container
        pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        idx = np.array([0, 1, 2, 0], np.uint16)  # +1 pad to 4-byte align
        blob = pos.tobytes() + idx.tobytes()
        gltf = {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0]}],
            "nodes": [{"mesh": 0}],
            "meshes": [{"primitives": [{"attributes": {"POSITION": 0},
                                        "indices": 1}]}],
            "accessors": [
                {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
                {"bufferView": 1, "componentType": 5123, "count": 3, "type": "SCALAR"},
            ],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": 36},
                {"buffer": 0, "byteOffset": 36, "byteLength": 6},
            ],
            "buffers": [{"byteLength": len(blob)}],
        }
        jsn = json.dumps(gltf).encode()
        jsn += b" " * ((4 - len(jsn) % 4) % 4)
        glb = struct.pack("<III", 0x46546C67, 2, 0)
        glb += struct.pack("<II", len(jsn), 0x4E4F534A) + jsn
        glb += struct.pack("<II", len(blob), 0x004E4942) + blob
        glb = glb[:8] + struct.pack("<I", len(glb)) + glb[12:]
        p = tmp_path / "tri.glb"
        p.write_bytes(glb)
        sc = load_gltf(p)
        assert sc.meshes.triangle_count == 1
