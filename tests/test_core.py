"""Core-layer tests: math conventions, AABB, args, asset paths, hashing."""

import numpy as np
import pytest

from renderengine_tpu.core import aabb, args, asset_path, hashing, math3d


class TestMath3d:
    def test_kclip_maps_gl_to_vk(self):
        # GL NDC corner (x=1, y=1, z=-1 .. 1) -> Vulkan (y flipped, z in [0,1])
        p = math3d.KCLIP @ np.array([1.0, 1.0, -1.0, 1.0], np.float32)
        assert np.allclose(p, [1.0, -1.0, 0.0, 1.0])
        p = math3d.KCLIP @ np.array([0.0, -1.0, 1.0, 1.0], np.float32)
        assert np.allclose(p, [0.0, 1.0, 1.0, 1.0])

    def test_look_at_places_eye_at_origin(self):
        eye = np.array([1.0, 2.0, 3.0], np.float32)
        v = math3d.look_at(eye, [0, 0, 0], [0, 1, 0])
        p = v @ np.array([*eye, 1.0], np.float32)
        assert np.allclose(p[:3], 0.0, atol=1e-6)

    def test_look_at_forward_is_minus_z(self):
        v = math3d.look_at([0, 0, 5], [0, 0, 0], [0, 1, 0])
        # A point in front of the camera lands at negative z in view space.
        p = v @ np.array([0.0, 0.0, 0.0, 1.0], np.float32)
        assert p[2] < 0

    def test_perspective_zo_depth_range(self):
        proj = math3d.perspective_zo(np.radians(45.0), 1.0, 0.1, 100.0)
        near = proj @ np.array([0, 0, -0.1, 1], np.float32)
        far = proj @ np.array([0, 0, -100.0, 1], np.float32)
        assert abs(near[2] / near[3]) < 1e-6
        assert abs(far[2] / far[3] - 1.0) < 1e-5

    def test_perspective_vk_reference_depth_quirk(self):
        # kClip on top of ZO lands depth in [0.5, 1] (reference quirk,
        # Camera.h:110-117). Pixel-matching requires reproducing it.
        proj = math3d.perspective_vk(np.radians(45.0), 1.0, 0.1, 100.0)
        near = proj @ np.array([0, 0, -0.1, 1], np.float32)
        far = proj @ np.array([0, 0, -100.0, 1], np.float32)
        assert abs(near[2] / near[3] - 0.5) < 1e-6
        assert abs(far[2] / far[3] - 1.0) < 1e-5

    def test_perspective_vk_flips_y(self):
        proj = math3d.perspective_vk(np.radians(90.0), 1.0, 0.1, 100.0)
        # A point up and in front of the camera should project to negative
        # (Vulkan screen-up is -y in NDC).
        p = proj @ np.array([0.0, 1.0, -2.0, 1.0], np.float32)
        assert p[1] / p[3] < 0

    def test_ortho_roundtrip(self):
        m = math3d.ortho_zo(-2, 2, -1, 1, 0.0, 10.0)
        p = m @ np.array([2.0, 1.0, -10.0, 1.0], np.float32)
        assert np.allclose(p[:3] / p[3], [1.0, 1.0, 1.0], atol=1e-6)

    def test_normal_matrix_nonuniform_scale(self):
        m = math3d.scale([2.0, 1.0, 1.0])
        n = math3d.normal_matrix(m) @ np.array([1.0, 0.0, 0.0], np.float32)
        n = n / np.linalg.norm(n)
        assert np.allclose(n, [1, 0, 0])
        # Under non-uniform scale a slanted normal must NOT be the plain
        # linear transform of itself.
        slanted = np.array([1.0, 1.0, 0.0], np.float32) / np.sqrt(2)
        nm = math3d.normal_matrix(m) @ slanted
        nm = nm / np.linalg.norm(nm)
        lin = m[:3, :3] @ slanted
        lin /= np.linalg.norm(lin)
        assert not np.allclose(nm, lin)

    def test_frustum_corners_roundtrip(self):
        view = math3d.look_at([0, 0, 5], [0, 0, 0], [0, 1, 0])
        proj = math3d.perspective_vk(np.radians(60.0), 4 / 3, 0.5, 50.0)
        corners = math3d.frustum_corners_world(view, proj)
        assert corners.shape == (8, 3)
        # Projecting the corners back must land on the NDC cube faces.
        clip = np.c_[corners, np.ones(8)] @ (proj @ view).T
        ndc = clip[:, :3] / clip[:, 3:4]
        assert np.all(np.abs(ndc[:, :2]) <= 1.0 + 1e-3)
        assert ndc[:, 2].min() >= -1e-3 and ndc[:, 2].max() <= 1 + 1e-3

    def test_directional_light_view_looks_along_light(self):
        d = math3d.normalize([1.0, -1.0, 0.5])
        v = math3d.directional_light_view(d)
        # light direction maps to view-space -z
        vd = v[:3, :3] @ d
        assert np.allclose(vd, [0, 0, -1], atol=1e-6)
        # handles the degenerate axis too
        v2 = math3d.directional_light_view([0.0, 0.0, 1.0])
        assert np.isfinite(v2).all()

    def test_rotate_matches_quarter_turn(self):
        r = math3d.rotate(np.pi / 2, [0, 0, 1])
        p = r[:3, :3] @ np.array([1.0, 0.0, 0.0], np.float32)
        assert np.allclose(p, [0, 1, 0], atol=1e-6)


class TestAABB:
    def test_empty_union(self):
        b = aabb.AABB()
        assert b.is_empty()
        c = aabb.AABB.from_points([[0, 0, 0], [1, 2, 3]])
        assert np.allclose(b.union(c).min, c.min)
        assert np.allclose(b.union(c).max, c.max)

    def test_intersects(self):
        a = aabb.AABB.from_points([[0, 0, 0], [1, 1, 1]])
        b = aabb.AABB.from_points([[0.5, 0.5, 0.5], [2, 2, 2]])
        c = aabb.AABB.from_points([[3, 3, 3], [4, 4, 4]])
        assert a.intersects(b)
        assert not a.intersects(c)

    def test_transform_refits(self):
        a = aabb.AABB.from_points([[-1, -1, -1], [1, 1, 1]])
        m = math3d.rotate(np.pi / 4, [0, 0, 1])
        t = a.transform(m)
        assert t.max[0] == pytest.approx(np.sqrt(2), rel=1e-5)


class TestArgs:
    def test_parse_pairs_and_flags(self):
        p = args.ArgumentParser()
        assert p.parse(["--gameDir", "/tmp/g", "--scenePath", "s.obj", "--fast"])
        assert p.get_string("gameDir") == "/tmp/g"
        assert p.get_string("scenePath") == "s.obj"
        assert p.get_bool("fast")
        assert p.get_int("missing", 7) == 7

    def test_help_returns_false(self):
        p = args.ArgumentParser(description="x")
        p.add_option("gameDir", "game dir")
        assert not p.parse(["--help"])


class TestAssetPath:
    def test_engine_and_game_roots(self, tmp_path):
        asset_path.set_engine_directory(tmp_path / "eng")
        asset_path.set_game_directory(tmp_path / "game")
        p = asset_path.AssetPath("/Engine/Textures/sky.png")
        assert p.get_path_on_disk() == tmp_path / "eng" / "Textures/sky.png"
        g = asset_path.AssetPath("/Game/scene.gltf")
        assert g.get_path_on_disk() == tmp_path / "game" / "scene.gltf"
        plain = asset_path.AssetPath(str(tmp_path / "x.bin"))
        assert plain.get_path_on_disk() == tmp_path / "x.bin"
        asset_path.set_engine_directory(asset_path.default_engine_directory())


class TestHash:
    def test_fnv_known_vector(self):
        # FNV-1a 64 of empty input is the offset basis.
        assert hashing.fnv_hash_data(b"") == 0xCBF29CE484222325
        assert hashing.fnv_hash_str("a") == 0xAF63DC4C8601EC8C
