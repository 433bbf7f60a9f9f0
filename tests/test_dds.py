"""DDS container + BC1/BC2/BC3/BC4/BC5 block decode
(≙ the reference's GLI/DDS texture path, TextureImporter.cpp:69-260)."""

import struct

import numpy as np
import pytest

from pt.scene.dds import (decode_bc_level, decode_dds, is_dds, parse_dds)


def make_dds(width, height, fourcc, payload, mip_count=1):
    """Minimal legacy-fourCC DDS file."""
    header = bytearray(128)
    header[0:4] = b"DDS "
    struct.pack_into("<7I", header, 4, 124, 0x21007, height, width, 0, 0,
                     mip_count)
    struct.pack_into("<2I4s5I", header, 4 + 72, 32, 0x4, fourcc, 0,
                     0, 0, 0, 0)
    return bytes(header) + payload


def bc1_block(c0, c1, indices):
    bits = 0
    for i, ix in enumerate(indices):
        bits |= (ix & 3) << (2 * i)
    return struct.pack("<HHI", c0, c1, bits)


def bc4_block(a0, a1, indices):
    bits = 0
    for i, ix in enumerate(indices):
        bits |= (ix & 7) << (3 * i)
    return bytes([a0, a1]) + bits.to_bytes(6, "little")


RED565, GREEN565, BLUE565 = 0xF800, 0x07E0, 0x001F


class TestBC1:
    def test_solid_endpoint_colors(self):
        blk = bc1_block(RED565, BLUE565, [0] * 8 + [1] * 8)
        img = decode_bc_level(blk, 4, 4, "bc1")
        assert img.shape == (4, 4, 4)
        np.testing.assert_allclose(img[0, 0], [1, 0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(img[2, 0], [0, 0, 1, 1], atol=1e-6)

    def test_four_color_interpolants(self):
        blk = bc1_block(RED565, BLUE565, [2] * 16)   # c0 > c1: 4-color mode
        img = decode_bc_level(blk, 4, 4, "bc1")
        np.testing.assert_allclose(img[0, 0], [2 / 3, 0, 1 / 3, 1], atol=1e-6)

    def test_three_color_transparent(self):
        blk = bc1_block(BLUE565, RED565, [3] * 16)   # c0 <= c1: 3-color
        img = decode_bc_level(blk, 4, 4, "bc1")
        np.testing.assert_allclose(img[0, 0], [0, 0, 0, 0], atol=1e-6)

    def test_raster_order(self):
        # texel 5 = (row 1, col 1) gets c1
        blk = bc1_block(RED565, BLUE565, [1 if i == 5 else 0
                                          for i in range(16)])
        img = decode_bc_level(blk, 4, 4, "bc1")
        np.testing.assert_allclose(img[1, 1], [0, 0, 1, 1], atol=1e-6)
        np.testing.assert_allclose(img[1, 2], [1, 0, 0, 1], atol=1e-6)


class TestBC4_BC5:
    def test_bc4_endpoints_and_interp(self):
        blk = bc4_block(255, 0, [0, 1, 2, 7] + [0] * 12)
        img = decode_bc_level(blk, 4, 4, "bc4")
        assert img[0, 0, 0] == pytest.approx(1.0)
        assert img[0, 1, 0] == pytest.approx(0.0)
        assert img[0, 2, 0] == pytest.approx(6 / 7, abs=1e-3)  # (6a0+a1)/7
        # six-interp mode: index 7 = (1*a0 + 6*a1)/7
        assert img[0, 3, 0] == pytest.approx(255 / 7 / 255, abs=1e-3)

    def test_bc4_four_interp_mode(self):
        blk = bc4_block(0, 255, [6, 7] + [0] * 14)   # a0 <= a1: 4-interp
        img = decode_bc_level(blk, 4, 4, "bc4")
        assert img[0, 0, 0] == pytest.approx(0.0)    # index 6 → 0
        assert img[0, 1, 0] == pytest.approx(1.0)    # index 7 → 255

    def test_bc5_normal_reconstruction(self):
        # x = y = 0 (encoded 128) → z = 1
        blk = bc4_block(128, 128, [0] * 16) * 2
        img = decode_bc_level(blk, 4, 4, "bc5")
        assert img[0, 0, 0] == pytest.approx(128 / 255)
        assert img[0, 0, 1] == pytest.approx(128 / 255)
        x = 128 / 255 * 2 - 1
        z_expect = np.sqrt(1 - 2 * x * x) * 0.5 + 0.5
        assert img[0, 0, 2] == pytest.approx(z_expect, abs=1e-5)


class TestBC2_BC3:
    def test_bc3_alpha_plus_color(self):
        payload = bc4_block(255, 0, [1] * 16) + bc1_block(GREEN565, BLUE565,
                                                          [0] * 16)
        img = decode_bc_level(payload, 4, 4, "bc3")
        np.testing.assert_allclose(img[0, 0], [0, 1, 0, 0], atol=2e-2)

    def test_bc2_explicit_alpha(self):
        abits = (0xF).to_bytes(1, "little") + b"\0" * 7   # texel0 α=1, rest 0
        payload = abits + bc1_block(RED565, BLUE565, [0] * 16)
        img = decode_bc_level(payload, 4, 4, "bc2")
        assert img[0, 0, 3] == pytest.approx(1.0)
        assert img[0, 1, 3] == pytest.approx(0.0)


class TestContainer:
    def test_parse_and_decode_dxt1(self):
        data = make_dds(4, 4, b"DXT1", bc1_block(RED565, BLUE565, [0] * 16))
        assert is_dds(data)
        info = parse_dds(data)
        assert (info.width, info.height, info.fmt) == (4, 4, "bc1")
        levels = decode_dds(data)
        assert len(levels) == 1
        np.testing.assert_allclose(levels[0][0, 0], [1, 0, 0, 1], atol=1e-6)

    def test_mip_chain_preserved(self):
        # 8x8 with 2 authored mips: level0 red, level1 blue (a generated
        # chain would make level1 red — proves the stored chain is used)
        lvl0 = bc1_block(RED565, RED565, [0] * 16) * 4
        lvl1 = bc1_block(BLUE565, BLUE565, [0] * 16)
        data = make_dds(8, 8, b"DXT1", lvl0 + lvl1, mip_count=2)
        levels = decode_dds(data)
        assert len(levels) == 2
        np.testing.assert_allclose(levels[0][0, 0], [1, 0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(levels[1][0, 0], [0, 0, 1, 1], atol=1e-6)

    def test_dx10_header(self):
        header = bytearray(make_dds(4, 4, b"DX10", b""))
        ext = struct.pack("<5I", 83, 3, 0, 1, 0)          # BC5_UNORM
        data = bytes(header) + ext + bc4_block(128, 128, [0] * 16) * 2
        info = parse_dds(data)
        assert info.fmt == "bc5" and info.data_offset == 148
        levels = decode_dds(data)
        assert levels[0].shape == (4, 4, 4)

    def test_non_multiple_of_4(self):
        data = make_dds(6, 6, b"DXT1",
                        bc1_block(RED565, RED565, [0] * 16) * 4)
        levels = decode_dds(data)
        assert levels[0].shape == (6, 6, 4)


class TestPipelineIntegration:
    def test_texture_info_metadata(self):
        from pt.scene.textures import get_texture_info
        from pt.scene.types import TextureInfo, TextureType
        data = make_dds(16, 8, b"DXT5",
                        b"\0" * (16 * ((16 // 4) * (8 // 4))))
        info = TextureInfo(name="t", type=TextureType.COLOR, data=data)
        info = get_texture_info(info)
        assert (info.width, info.height) == (16, 8)

    def test_grad_sampling_uses_authored_mips(self):
        """The textureGrad-equivalent LOD path must fetch the AUTHORED
        chain: a DDS with red level 0 and blue level 1 samples red for
        tiny footprints and blue for one-texel-per-pixel footprints
        (≙ the mips debug view over pre-mipped BCn content)."""
        import jax.numpy as jnp
        from pt.render.textures import sample_texture_grad
        from pt.scene.textures import build_texture_pool
        from pt.scene.types import TextureInfo, TextureType
        lvl0 = bc1_block(RED565, RED565, [0] * 16) * 4
        lvl1 = bc1_block(BLUE565, BLUE565, [0] * 16)
        data = make_dds(8, 8, b"DXT1", lvl0 + lvl1, mip_count=2)
        pool = build_texture_pool([TextureInfo(
            name="t", type=TextureType.COLOR, data=data)])
        idx = jnp.asarray([9, 9])               # first scene slot
        uv = jnp.asarray([[0.5, 0.5], [0.5, 0.5]], jnp.float32)
        fine = jnp.asarray([[1e-4, 0.0], [0.25, 0.0]], jnp.float32)
        texel = np.asarray(sample_texture_grad(pool, idx, uv, fine, fine))
        assert texel[0, 0] > 0.5 and texel[0, 2] < 0.2   # level 0: red
        assert texel[1, 2] > 0.5 and texel[1, 0] < 0.2   # level 1+: blue

    def test_pool_keeps_authored_mips(self):
        from pt.render.textures import MAX_MIPS
        from pt.scene.textures import build_texture_pool
        from pt.scene.types import TextureInfo, TextureType
        lvl0 = bc1_block(RED565, RED565, [0] * 16) * 4
        lvl1 = bc1_block(BLUE565, BLUE565, [0] * 16)
        data = make_dds(8, 8, b"DXT1", lvl0 + lvl1, mip_count=2)
        pool = build_texture_pool([TextureInfo(
            name="t", type=TextureType.NORMAL, data=data)])
        idx = 9                                    # first scene texture slot
        assert int(pool.mip_counts[idx]) >= 4      # 8x8→1x1 completed chain
        # level 1 must be the authored blue, not a red downsample
        off = int(pool.offsets[idx, 1])
        np.testing.assert_allclose(np.asarray(pool.data[off])[:3],
                                   [0, 0, 1], atol=1e-6)
