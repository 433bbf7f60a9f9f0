"""Texture pipeline tests: decode, HDR reader, budget downscale, device pool
sampling, sRGB handling."""

import io

import numpy as np
import jax.numpy as jnp
import pytest

from pt.core.config import Config
from pt.render.textures import (DeviceTextures, TexturePoolBuilder,
                                add_default_textures, build_mip_chain,
                                default_texture_pool, sample_texture_grad,
                                srgb_to_linear)
from pt.scene.textures import (build_texture_pool, get_texture_info,
                               load_texture_pixels, read_radiance_hdr)
from pt.scene.types import (DEFAULT_NORMAL_TEXTURE, SCENE_TEXTURE_OFFSET,
                            TextureInfo, TextureType)


def _png_bytes(pixels_u8):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(pixels_u8).save(buf, format="PNG")
    return buf.getvalue()


def _write_hdr(rgb: np.ndarray) -> bytes:
    """Flat (non-RLE) Radiance writer for the reader test."""
    h, w = rgb.shape[:2]
    header = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + \
        f"-Y {h} +X {w}\n".encode()
    maxc = rgb.max(axis=-1)
    exp = np.where(maxc > 0, np.floor(np.log2(np.maximum(maxc, 1e-38))) + 1,
                   0).astype(np.int32)
    scale = np.where(maxc > 0, 2.0 ** (8 - exp), 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(rgb * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(maxc > 0, exp + 128, 0).astype(np.uint8)
    return header + rgbe.tobytes()


def test_hdr_roundtrip():
    rng = np.random.default_rng(0)
    rgb = (rng.random((8, 16, 3)) * 100.0).astype(np.float32)
    out = read_radiance_hdr(_write_hdr(rgb))
    assert out.shape == (8, 16, 3)
    # RGBE quantization: relative error bounded by ~1/256
    rel = np.abs(out - rgb) / np.maximum(rgb.max(-1, keepdims=True), 1e-6)
    assert rel.max() < 0.01


def test_png_decode_and_metadata():
    px = np.zeros((4, 6, 3), np.uint8)
    px[0, 0] = (255, 0, 0)
    info = TextureInfo(name="t", type=TextureType.COLOR,
                       data=_png_bytes(px))
    info = get_texture_info(info)
    assert (info.width, info.height) == (6, 4)
    decoded = load_texture_pixels(info)
    assert decoded.shape == (4, 6, 4)
    np.testing.assert_allclose(decoded[0, 0], [1, 0, 0, 1])


def test_broken_texture_fallback():
    info = TextureInfo(name="bad", type=TextureType.COLOR,
                       data=b"not an image")
    pool = build_texture_pool([info], Config())
    # slot SCENE_TEXTURE_OFFSET exists (magenta placeholder), pool valid
    assert pool.count == SCENE_TEXTURE_OFFSET + 1
    # row layout may be pair-duplicated (P, 8) bf16 (perf_budget §14);
    # the first 4 components are always the texel
    texel = np.asarray(
        pool.data[int(pool.offsets[SCENE_TEXTURE_OFFSET, 0])],
        dtype=np.float32)[:4]
    np.testing.assert_allclose(texel, [1, 0, 1, 1])


def test_budget_downscale():
    big = np.full((512, 512, 3), 128, np.uint8)
    infos = [TextureInfo(name=f"t{i}", type=TextureType.NORMAL,
                         data=_png_bytes(big)) for i in range(2)]
    cfg = Config(max_texture_size=4096,
                 texture_memory_budget=2 * 128 * 128 * 21)   # tiny budget
    pool = build_texture_pool(infos, cfg)
    w = int(pool.sizes[SCENE_TEXTURE_OFFSET, 0, 0])
    assert w <= 128                         # forced below native 512


def test_srgb_applied_to_color_only():
    gray = np.full((2, 2, 3), 128, np.uint8)
    infos = [TextureInfo(name="c", type=TextureType.COLOR,
                         data=_png_bytes(gray), is_srgb=True),
             TextureInfo(name="n", type=TextureType.NORMAL,
                         data=_png_bytes(gray), is_srgb=False)]
    pool = build_texture_pool(infos, Config())
    c = float(pool.data[int(pool.offsets[SCENE_TEXTURE_OFFSET, 0])][0])
    n = float(pool.data[int(pool.offsets[SCENE_TEXTURE_OFFSET + 1, 0])][0])
    # expectations rounded through the pool's storage dtype (bf16 by
    # default, perf_budget §14) so the test checks the transfer function,
    # not the storage precision
    dt = pool.data.dtype
    assert abs(c - float(np.asarray(srgb_to_linear(128 / 255.0),
                                    dtype=dt))) < 1e-6
    assert abs(n - float(np.asarray(128 / 255.0, dtype=dt))) < 1e-6


def test_mip_chain_and_trilinear():
    # 4x4 checkerboard: level 1+ average to 0.5
    px = np.indices((4, 4)).sum(0) % 2
    px = np.repeat(px[..., None], 4, axis=-1).astype(np.float32)
    b = TexturePoolBuilder()
    add_default_textures(b)
    b.add(px, generate_mips=True)
    pool = b.build()
    assert int(pool.mip_counts[SCENE_TEXTURE_OFFSET]) == 3
    idx = jnp.full((1,), SCENE_TEXTURE_OFFSET, jnp.int32)
    uv = jnp.asarray([[0.5, 0.5]])
    # huge derivatives force the 1x1 top mip = global average 0.5
    big = jnp.asarray([[10.0, 0.0]])
    out = np.asarray(sample_texture_grad(pool, idx, uv, big, big))
    np.testing.assert_allclose(out[0, :3], 0.5, atol=1e-5)


def test_default_pool_constants():
    pool = default_texture_pool()
    assert pool.all_constant
    idx = jnp.asarray([DEFAULT_NORMAL_TEXTURE], jnp.int32)
    out = np.asarray(sample_texture_grad(pool, idx, jnp.asarray([[0.3, 0.7]])))
    # default pool stores bf16 rows (perf_budget §14): ~2^-9 rounding
    np.testing.assert_allclose(out[0], [128 / 255, 128 / 255, 1, 1],
                               atol=1.0 / 256)


def test_repeat_wrap():
    px = np.zeros((1, 2, 3), np.float32)
    px[0, 0] = 1.0                        # left texel white, right black
    b = TexturePoolBuilder()
    add_default_textures(b)
    b.add(px, generate_mips=False)
    pool = b.build()
    idx = jnp.full((2,), SCENE_TEXTURE_OFFSET, jnp.int32)
    uv = jnp.asarray([[0.25, 0.5], [1.25, 0.5]])   # u and u+1 must match
    out = np.asarray(sample_texture_grad(pool, idx, uv))
    np.testing.assert_allclose(out[0], out[1], atol=1e-6)


def _rand_pool(paired=False, dtype=None, seed=0, quad=False):
    rng = np.random.default_rng(seed)
    b = TexturePoolBuilder(paired=paired, quad=quad)
    add_default_textures(b)
    # non-square + non-pow2 shapes exercise the stride/wrap math
    for shape in [(8, 8), (4, 16), (5, 3), (1, 7)]:
        b.add(rng.random((*shape, 4)).astype(np.float32),
              generate_mips=True)
    return b.build(dtype=dtype)


def test_paired_pool_bit_exact():
    """The paired (stride w+1, duplicated wrap column) layout must return
    bit-identical samples to the baseline layout: same texels, same
    filter weights, only the fetch shape differs."""
    base = _rand_pool(paired=False)
    pair = _rand_pool(paired=True)
    rng = np.random.default_rng(1)
    n = 256
    idx = jnp.asarray(rng.integers(SCENE_TEXTURE_OFFSET,
                                   SCENE_TEXTURE_OFFSET + 4, n), jnp.int32)
    uv = jnp.asarray(rng.random((n, 2)) * 3.0 - 1.0, jnp.float32)
    dx = jnp.asarray(rng.random((n, 2)) * 0.3, jnp.float32)
    dy = jnp.asarray(rng.random((n, 2)) * 0.3, jnp.float32)
    for args in [(idx, uv), (idx, uv, dx, dy)]:
        a = np.asarray(sample_texture_grad(base, *args))
        b = np.asarray(sample_texture_grad(pair, *args))
        np.testing.assert_array_equal(a, b)
    # nearest-mip path too
    a = np.asarray(sample_texture_grad(base, idx, uv, dx, dy,
                                       nearest_mip=True))
    b = np.asarray(sample_texture_grad(pair, idx, uv, dx, dy,
                                       nearest_mip=True))
    np.testing.assert_array_equal(a, b)


def test_bf16_pool_close_and_half_size():
    base = _rand_pool(dtype=jnp.float32)   # explicit f32 reference pool
    bf = _rand_pool(dtype=jnp.bfloat16)
    assert bf.data.dtype == jnp.bfloat16
    assert bf.data.nbytes == base.data.nbytes // 2
    rng = np.random.default_rng(2)
    n = 256
    idx = jnp.asarray(rng.integers(SCENE_TEXTURE_OFFSET,
                                   SCENE_TEXTURE_OFFSET + 4, n), jnp.int32)
    uv = jnp.asarray(rng.random((n, 2)), jnp.float32)
    a = np.asarray(sample_texture_grad(base, idx, uv))
    b = np.asarray(sample_texture_grad(bf, idx, uv))
    assert b.dtype == np.float32            # upcast after the gather
    # bf16 has 8 mantissa bits: texels in [0,1] round within ~2^-9
    np.testing.assert_allclose(a, b, atol=1.0 / 256)


def test_nearest_mip_matches_trilinear_at_integer_lod():
    """At an exactly-integer LOD the trilinear blend weight is 0, so
    nearest-mip and trilinear agree bit-for-bit; in between, nearest
    returns one of the two bracketing mips' bilinear values."""
    px = np.indices((8, 8)).sum(0) % 2
    px = np.repeat(px[..., None], 4, axis=-1).astype(np.float32)
    b = TexturePoolBuilder()
    add_default_textures(b)
    b.add(px, generate_mips=True)
    pool = b.build()
    idx = jnp.full((1,), SCENE_TEXTURE_OFFSET, jnp.int32)
    uv = jnp.asarray([[0.37, 0.61]])
    # rho = 2/8 → level exactly 1.0
    d = jnp.asarray([[0.25, 0.0]])
    tri = np.asarray(sample_texture_grad(pool, idx, uv, d, d))
    near = np.asarray(sample_texture_grad(pool, idx, uv, d, d,
                                          nearest_mip=True))
    np.testing.assert_array_equal(tri, near)
    # fractional level: nearest must equal the rounded level's bilinear
    d = jnp.asarray([[0.3, 0.0]])          # level = log2(2.4) ≈ 1.26 → 1
    near = np.asarray(sample_texture_grad(pool, idx, uv, d, d,
                                          nearest_mip=True))
    np.testing.assert_array_equal(
        near, np.asarray(sample_texture_grad(pool, idx, uv,
                                             jnp.asarray([[0.25, 0.0]]),
                                             jnp.asarray([[0.25, 0.0]]))))


def test_pool_layout_policy():
    """Round-5 layout policy (VERDICT r4 task 6, resolved by a same-day
    4-arm A/B on the frozen r2 pool): QUAD rows at every pool size —
    wider rows measured monotonically faster (flat-f32 0.492 →
    flat-bf16 0.524 → pair 0.553 → quad 0.576 Mrays/s on the 9.9 MiB
    pool; docs/perf_budget.md §14.5). Explicit overrides always win,
    and every layout samples identically."""
    auto = _rand_pool(paired=None, quad=None)
    assert auto.quad is True and auto.paired is False     # quad default
    flat = _rand_pool(paired=False, quad=False)
    assert flat.paired is False and flat.quad is False
    forced_pair = _rand_pool(paired=True)
    assert forced_pair.paired is True and forced_pair.quad is False
    # layouts decided at build() are bit-exact vs flat rows
    rng = np.random.default_rng(3)
    idx = jnp.asarray(rng.integers(SCENE_TEXTURE_OFFSET,
                                   SCENE_TEXTURE_OFFSET + 4, 64), jnp.int32)
    uv = jnp.asarray(rng.random((64, 2)), jnp.float32)
    for pool in (auto, forced_pair):
        np.testing.assert_array_equal(
            np.asarray(sample_texture_grad(flat, idx, uv)),
            np.asarray(sample_texture_grad(pool, idx, uv)))


def test_quad_pool_bit_exact():
    """The quad layout (all four wrap-neighbor corners per row) must
    return bit-identical samples to the flat layout on every sampling
    path — same texels, same filter weights, one gather instead of
    four."""
    base = _rand_pool(paired=False)
    quadp = _rand_pool(paired=False, quad=True)
    assert quadp.quad is True
    assert quadp.data.shape[-1] == 16
    rng = np.random.default_rng(11)
    n = 256
    idx = jnp.asarray(rng.integers(SCENE_TEXTURE_OFFSET,
                                   SCENE_TEXTURE_OFFSET + 4, n), jnp.int32)
    uv = jnp.asarray(rng.random((n, 2)) * 3.0 - 1.0, jnp.float32)
    dx = jnp.asarray(rng.random((n, 2)) * 0.3, jnp.float32)
    dy = jnp.asarray(rng.random((n, 2)) * 0.3, jnp.float32)
    for args in [(idx, uv), (idx, uv, dx, dy)]:
        a = np.asarray(sample_texture_grad(base, *args))
        b = np.asarray(sample_texture_grad(quadp, *args))
        np.testing.assert_array_equal(a, b)
    a = np.asarray(sample_texture_grad(base, idx, uv, dx, dy,
                                       nearest_mip=True))
    b = np.asarray(sample_texture_grad(quadp, idx, uv, dx, dy,
                                       nearest_mip=True))
    np.testing.assert_array_equal(a, b)


def test_hdr_sourced_pool_keeps_f32_rows():
    """ADVICE r4: the reference keeps RGBAF32-sourced textures in f32
    storage (TextureUploader::GetImageFormat), so a pool holding
    HDR-range texels must not default to bf16 rows (absolute rounding at
    HDR magnitudes); 8-bit-sourced pools keep the bf16 default."""
    b = TexturePoolBuilder()
    add_default_textures(b)
    b.add(np.full((4, 4, 4), 37.5, np.float32), generate_mips=False)
    pool = b.build()
    assert pool.data.dtype == jnp.float32
    assert float(np.asarray(
        pool.data[pool.offsets[SCENE_TEXTURE_OFFSET, 0]][0])) == 37.5
    ldr = TexturePoolBuilder()
    add_default_textures(ldr)
    ldr.add(np.full((4, 4, 4), 0.5, np.float32), generate_mips=False)
    assert ldr.build().data.dtype == jnp.bfloat16
    # explicit dtype overrides the HDR auto-selection
    forced = TexturePoolBuilder()
    add_default_textures(forced)
    forced.add(np.full((4, 4, 4), 37.5, np.float32), generate_mips=False)
    assert forced.build(dtype=jnp.bfloat16).data.dtype == jnp.bfloat16


def test_reference_exact_preset():
    """ADVICE r4: one-call presets flipping every default-on divergence
    (PARITY.md) back to reference-exact."""
    from pt.render.integrator import PathTracingSettings
    from pt.scene.examples import make_default_scene
    from pt.scene.textures import build_scene_textures

    s = PathTracingSettings.reference_exact(bounce_count=3)
    assert s.tex_nearest_tail is False
    assert s.reverse_point_shadows is False
    assert s.bounce_count == 3
    pool = build_scene_textures(make_default_scene(),
                                reference_exact=True)
    assert pool.paired is False and pool.quad is False
    assert pool.data.dtype == jnp.float32
