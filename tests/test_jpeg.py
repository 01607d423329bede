"""Native JPEG decoder (baseline + progressive) vs Pillow (the stb_image
parity seam: reference TextureCache.cpp:67 reads .jpg via stb, which
decodes both modes; Skybox.cpp:71-79 ships six .jpg faces). 4:4:4 and
grayscale must be bit-exact; subsampled chroma within a small tolerance
(upsample filters legitimately differ)."""

import io

import numpy as np
import pytest

pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from renderengine_tpu.native import decode_jpeg, load_library  # noqa: E402

if load_library() is None:
    pytest.skip("native library unavailable", allow_module_level=True)


def _encode(img, **kw):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", **kw)
    return buf.getvalue()


def _img(w, h, rng):
    base = rng.uniform(0, 255, (h // 8 + 1, w // 8 + 1, 3))
    return np.kron(base, np.ones((8, 8, 1)))[:h, :w].astype(np.uint8)


class TestJpegDecode:
    @pytest.mark.parametrize("w,h,sub,q,tol_max,tol_mean", [
        (64, 64, 0, 95, 0, 0.0),      # 4:4:4: bit-exact vs libjpeg
        (97, 61, 2, 85, 4, 1.0),      # 4:2:0, odd extents
        (130, 40, 1, 70, 4, 1.0),     # 4:2:2
    ])
    def test_matches_pillow(self, rng, w, h, sub, q, tol_max, tol_mean):
        img = _img(w, h, rng)
        data = _encode(img, quality=q, subsampling=sub)
        mine = decode_jpeg(data)
        assert mine is not None and mine.shape == (h, w, 4)
        assert (mine[..., 3] == 255).all()
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        d = np.abs(mine[..., :3].astype(int) - pil.astype(int))
        assert d.max() <= tol_max
        assert d.mean() <= tol_mean

    def test_grayscale_exact(self, rng):
        g = np.kron(rng.uniform(0, 255, (8, 8)),
                    np.ones((8, 8)))[:50, :50].astype(np.uint8)
        data = _encode(g, quality=90)
        mine = decode_jpeg(data)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("L"))
        np.testing.assert_array_equal(mine[..., 0], pil)
        np.testing.assert_array_equal(mine[..., 0], mine[..., 1])

    def test_restart_markers(self, rng):
        img = _img(97, 61, rng)
        data = _encode(img, quality=85, subsampling=2,
                       restart_marker_blocks=2)
        mine = decode_jpeg(data)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        d = np.abs(mine[..., :3].astype(int) - pil.astype(int))
        assert d.max() <= 4

    @pytest.mark.parametrize("w,h,sub,q,tol_max", [
        (64, 64, 0, 95, 3),           # 4:4:4 (AC refine rounding differs
        #                               from libjpeg by <= a few LSB)
        (97, 61, 2, 75, 4),           # 4:2:0, odd extents
        (130, 40, 1, 85, 4),          # 4:2:2
    ])
    def test_progressive(self, rng, w, h, sub, q, tol_max):
        """SOF2: spectral-selection + successive-approximation scans
        accumulate; decoded image matches libjpeg within a few LSB."""
        img = _img(w, h, rng)
        data = _encode(img, quality=q, subsampling=sub, progressive=True)
        assert b"\xff\xc2" in data[:4096]   # really SOF2
        mine = decode_jpeg(data)
        assert mine is not None and mine.shape == (h, w, 4)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        d = np.abs(mine[..., :3].astype(int) - pil.astype(int))
        assert d.max() <= tol_max

    def test_progressive_grayscale(self, rng):
        g = np.kron(rng.uniform(0, 255, (8, 8)),
                    np.ones((8, 8)))[:50, :50].astype(np.uint8)
        data = _encode(g, quality=90, progressive=True)
        mine = decode_jpeg(data)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("L"))
        assert np.abs(mine[..., 0].astype(int) - pil.astype(int)).max() <= 1

    def test_progressive_restart_markers(self, rng):
        import re

        img = _img(97, 61, rng)
        data = _encode(img, quality=80, subsampling=2, progressive=True,
                       restart_marker_rows=1)
        assert len(re.findall(rb"\xff[\xd0-\xd7]", data)) > 4
        mine = decode_jpeg(data)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert np.abs(mine[..., :3].astype(int) - pil.astype(int)).max() <= 4

    def test_texture_cache_loads_jpeg(self, rng, tmp_path):
        from renderengine_tpu.scene.textures import TextureCache

        img = _img(64, 64, rng)
        p = tmp_path / "t.jpg"
        p.write_bytes(_encode(img, quality=95, subsampling=0))
        tc = TextureCache()
        h1 = tc.load_texture(str(p))
        h2 = tc.load_texture(str(p))   # path-dedup
        assert h1 == h2 == 0
        assert len(tc) == 1
