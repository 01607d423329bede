"""16-bit texture pipeline parity (reference loads everything as
R16G16B16A16Unorm via stbi_load_16 — TextureCache.h:59, .cpp:67): a
16-bit gradient must round-trip through PNG + atlas + sampler without
8-bit banding."""

import numpy as np
import jax.numpy as jnp

from renderengine_tpu.scene.textures import TextureCache
from renderengine_tpu.shading import sampling
from renderengine_tpu.utils.png import write_png, read_png


def _gradient16(w=256):
    """[1,w,4] u16 ramp with sub-8-bit steps (step 73 < 257)."""
    g = (np.arange(w, dtype=np.uint16) * 73)[None, :, None]
    img = np.repeat(g, 4, axis=2)
    img[..., 3] = 65535
    return np.repeat(img, 4, axis=0)  # [4,w,4]


class TestTexture16:
    def test_png16_roundtrip_read(self, tmp_path):
        img = _gradient16(64)
        # hand-write a 16-bit PNG via the encoder path: encode_png only
        # does 8-bit, so write with struct directly through numpy bytes
        import struct, zlib
        h, w = img.shape[:2]
        raw = b"".join(
            b"\x00" + img[y].astype(">u2").tobytes() for y in range(h))
        data = zlib.compress(raw)

        def chunk(tag, payload):
            return (struct.pack(">I", len(payload)) + tag + payload
                    + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

        ihdr = struct.pack(">IIBBBBB", w, h, 16, 6, 0, 0, 0)
        p = tmp_path / "g16.png"
        p.write_bytes(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                      + chunk(b"IDAT", data) + chunk(b"IEND", b""))
        back = read_png(str(p))
        assert back.dtype == np.uint16
        np.testing.assert_array_equal(back, img)

    def test_atlas_no_banding(self):
        img = _gradient16(128)
        tc = TextureCache()
        tc.add_texture(img, mips=False)
        dev = tc.build_atlas()
        # u32-packed rows: width 8 == u16 content
        assert dev["atlas"].dtype == np.uint32 and dev["atlas"].shape[-1] == 8

        # sample every texel center at mip 0: values must be u16-exact,
        # i.e. adjacent texels differ by 73/65535 (an 8-bit pipeline
        # quantizes them onto the same 1/255 step)
        xs = (jnp.arange(128, dtype=jnp.float32) + 0.5) / 128.0
        uv = jnp.stack([xs, jnp.full_like(xs, 0.5)], -1)[None]  # [1,128,2]
        out = sampling.sample_texture(dev["atlas"], jnp.asarray(dev["tex_table"]),
                                      jnp.asarray(dev["mip_y"]),
                                      jnp.asarray(dev["mip_x"]),
                                      jnp.zeros((1, 128), jnp.int32), uv)
        got = np.asarray(out)[0, :, 0]
        want = (np.arange(128) * 73) / 65535.0
        np.testing.assert_allclose(got, want, atol=1.5 / 65535.0)
        steps = np.diff(got)
        assert (steps > 0).all(), "banding: repeated quantized values"

    def test_mixed_8_and_16_bit_promotes(self):
        tc = TextureCache()
        tc.add_texture(np.full((8, 8, 4), 128, np.uint8), mips=False)
        tc.add_texture(_gradient16(8), mips=False)
        dev = tc.build_atlas()
        assert dev["atlas"].dtype == np.uint32 and dev["atlas"].shape[-1] == 8
        # the 8-bit texture's value must still read as 128/255
        uv = jnp.full((1, 1, 2), 0.5, jnp.float32)
        out = sampling.sample_texture(dev["atlas"], jnp.asarray(dev["tex_table"]),
                                      jnp.asarray(dev["mip_y"]),
                                      jnp.asarray(dev["mip_x"]),
                                      jnp.zeros((1, 1), jnp.int32), uv)
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0], 128 / 255.0,
                                   atol=1e-4)
