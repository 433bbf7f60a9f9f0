"""Texture import + device upload pipeline.

Counterpart of the reference's TextureImporter (stb/gli decode,
TextureImporter.cpp) and TextureUploader (multi-threaded streaming decode,
VRAM-budget-driven downscaling, sRGB-vs-linear format selection,
TextureUploader.cpp:272-595):

* metadata without pixel load (`get_texture_info` ≙ GetTextureInfo)
* PIL decode for PNG/JPG/TGA/WEBP/DDS + a native Radiance .hdr reader
  (PIL lacks one; HDR feeds equirect skyboxes)
* parallel decode on a ThreadDispatch pool (≙ loader jthreads)
* budget policy: textures above `max_texture_size` or exceeding the memory
  budget are box-downscaled before upload (≙ DetermineMaxTextureSizes +
  the scaling-image downsample path, TextureUploader.cpp:401-569)
* sRGB decode for color/emissive at upload (≙ GetImageFormat,
  TextureUploader.cpp:571-595)

Output is the flat DeviceTextures pool (pt.render.textures): defaults at
slots 0..8, scene textures from SCENE_TEXTURE_OFFSET in registration order.
"""

from __future__ import annotations

import io
from typing import List, Optional, Tuple

import numpy as np

from pt.core.config import Config, get_config
from pt.core.threads import ThreadDispatch
from pt.render.textures import (DeviceTextures, TexturePoolBuilder,
                                add_default_textures)
from pt.scene.types import TextureInfo, TextureType


def read_radiance_hdr(data: bytes) -> np.ndarray:
    """Minimal Radiance RGBE (.hdr) reader → (H, W, 3) float32.
    (≙ stb_image's HDR path used for skyboxes, TextureImporter.cpp:24+)."""
    stream = io.BytesIO(data)
    if not stream.readline().startswith(b"#?"):
        raise ValueError("not a Radiance HDR file")
    while True:
        line = stream.readline()
        if line in (b"\n", b""):
            break
    dims = stream.readline().split()
    if len(dims) != 4 or dims[0] != b"-Y" or dims[2] != b"+X":
        raise ValueError(f"unsupported HDR orientation {dims}")
    h, w = int(dims[1]), int(dims[3])
    raw = stream.read()
    rgbe = np.zeros((h, w, 4), np.uint8)
    pos = 0
    for y in range(h):
        if raw[pos] == 2 and raw[pos + 1] == 2:     # adaptive RLE
            if ((raw[pos + 2] << 8) | raw[pos + 3]) != w:
                raise ValueError("HDR adaptive-RLE scanline width mismatch")
            pos += 4
            for c in range(4):
                x = 0
                while x < w:
                    count = raw[pos]
                    pos += 1
                    if count > 128:                 # run
                        rgbe[y, x:x + count - 128, c] = raw[pos]
                        pos += 1
                        x += count - 128
                    else:                           # literal
                        rgbe[y, x:x + count, c] = np.frombuffer(
                            raw, np.uint8, count, pos)
                        pos += count
                        x += count
        else:            # flat scanline, possibly with old-style RLE runs
            # old-style RLE: a pixel (1,1,1,n) repeats the previous pixel
            # n<<shift times (consecutive markers raise shift by 8). A
            # purely flat file has no such markers and decodes in one
            # vectorized copy; marker handling is chunked so legacy files
            # stay fast.
            x = 0
            shift = 0
            while x < w:
                avail = min(w - x, (len(raw) - pos) // 4)
                if avail <= 0:
                    raise ValueError("truncated HDR scanline")
                cand = np.frombuffer(raw, np.uint8, avail * 4,
                                     pos).reshape(avail, 4)
                marks = np.flatnonzero((cand[:, 0] == 1) & (cand[:, 1] == 1)
                                       & (cand[:, 2] == 1))
                lit = int(marks[0]) if len(marks) else avail
                if lit:
                    rgbe[y, x:x + lit] = cand[:lit]
                    x += lit
                    pos += lit * 4
                    shift = 0
                if len(marks) and lit == int(marks[0]):
                    count = int(cand[lit, 3]) << shift
                    prev = (rgbe[y, x - 1] if x
                            else rgbe[y - 1, w - 1] if y else 0)
                    end = min(x + count, w)
                    rgbe[y, x:end] = prev
                    x = end
                    pos += 4
                    shift += 8
    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp == 0, 0.0,
                     np.ldexp(1.0, exp - 136)).astype(np.float32)
    return rgbe[..., :3].astype(np.float32) * scale[..., None]


def _decode_bytes(data: bytes, name: str) -> np.ndarray:
    """Decode encoded image bytes → (H, W, 4) float32 in [0,1] (LDR) or
    linear floats (HDR)."""
    if data[:2] == b"#?":
        rgb = read_radiance_hdr(data)
        return np.concatenate([rgb, np.ones_like(rgb[..., :1])], axis=-1)
    from pt.scene.dds import decode_dds, is_dds
    if is_dds(data):
        # native BC1/BC3/BC5 block decode (PIL's DDS plugin lacks BC5,
        # the reference's normal-map format, TextureImporter.cpp:69-260)
        return decode_dds(data, max_levels=1)[0]
    from PIL import Image
    img = Image.open(io.BytesIO(data))
    img = img.convert("RGBA")
    return np.asarray(img, np.float32) / 255.0


def get_texture_info(info: TextureInfo) -> TextureInfo:
    """Fill width/height metadata without decoding pixels
    (≙ TextureImporter::GetTextureInfo)."""
    if info.pixels is not None:
        info.height, info.width = info.pixels.shape[:2]
        return info
    try:
        from pt.scene.dds import parse_dds
        header = info.data[:256] if info.data is not None else None
        if header is None and info.path is not None:
            with open(info.path, "rb") as f:
                header = f.read(256)
        if header is not None and header[:4] == b"DDS ":
            # metadata without pixel load (≙ GetDDSTextureInfo,
            # TextureImporter.cpp:69-130)
            dinfo = parse_dds(header + b"\0" * max(0, 148 - len(header)))
            info.width, info.height = dinfo.width, dinfo.height
            return info
        from PIL import Image
        if info.path is not None:
            with Image.open(info.path) as im:
                info.width, info.height = im.size
        elif info.data is not None and info.data[:2] != b"#?":
            with Image.open(io.BytesIO(info.data)) as im:
                info.width, info.height = im.size
    except Exception:
        pass
    return info


def load_texture_pixels(info: TextureInfo) -> Optional[np.ndarray]:
    """Full decode → (H, W, 4) float32; None on failure (caller falls back
    to the default texture, ≙ SceneImporter.cpp:89-98)."""
    try:
        if info.pixels is not None:
            raw = np.asarray(info.pixels)
            px = raw.astype(np.float32)
            if px.ndim == 2:
                px = px[..., None]
            if px.shape[-1] == 1:                      # gray → RGB
                px = np.repeat(px, 3, axis=-1)
            elif px.shape[-1] == 2:                    # gray+alpha
                px = np.concatenate(
                    [np.repeat(px[..., :1], 3, axis=-1), px[..., 1:]], -1)
            if px.shape[-1] == 3:
                px = np.concatenate([px, np.ones_like(px[..., :1])], -1)
            # normalize by the SOURCE dtype (the old check ran after the
            # float32 conversion, so it fell back to a value heuristic
            # that kept dark uint8 masks raw and wrongly divided genuine
            # HDR float data)
            if raw.dtype == np.uint8:
                px = px / 255.0
            elif raw.dtype == np.uint16:
                px = px / 65535.0
            return px
        data = info.data
        if data is None and info.path is not None:
            with open(info.path, "rb") as f:
                data = f.read()
        if data is None:
            return None
        return _decode_bytes(data, info.name)
    except Exception:
        return None


def load_texture_mips(info: TextureInfo) -> Optional[List[np.ndarray]]:
    """For containers that carry a pre-built mip chain (DDS), decode the
    whole chain so the pool keeps the authored mips instead of regenerating
    (≙ the pre-mipped BCn upload, Image.cpp:226-256). None for all other
    sources (caller uses load_texture_pixels + generated mips)."""
    try:
        data = info.data
        if data is None and info.path is not None:
            if not str(info.path).lower().endswith(".dds"):
                return None
            with open(info.path, "rb") as f:
                data = f.read()
        if data is None or data[:4] != b"DDS ":
            return None
        from pt.scene.dds import decode_dds, parse_dds
        dinfo = parse_dds(data)
        if dinfo.mip_count <= 1:
            return None
        return decode_dds(data, dinfo)
    except Exception:
        return None


def _downscale_to(pixels: np.ndarray, max_dim: int) -> np.ndarray:
    """Repeated 2x box downsample until both dims ≤ max_dim (≙ the blit
    downscale chain through scaling images, TextureUploader.cpp:401-514)."""
    from pt.render.textures import _downsample2x
    while max(pixels.shape[0], pixels.shape[1]) > max_dim:
        pixels = _downsample2x(pixels)
    return pixels


def _budget_max_dim(infos: List[TextureInfo], cfg: Config) -> int:
    """Shrink the global size cap until the estimated pool fits the memory
    budget (≙ GetImageMemoryBudget → DetermineMaxTextureSizes,
    TextureUploader.cpp:551-569). Pool texels are RGBA f32 with mips (x4/3)."""
    max_dim = cfg.max_texture_size
    # default pool format since round 5: quad rows (16 ch) x bf16 (2 B)
    # = 32 B/texel, x4/3 for generated mips
    bytes_per_texel = 32 * 4 // 3
    while max_dim > 64:
        total = 0
        for info in infos:
            w = min(info.width or max_dim, max_dim)
            h = min(info.height or max_dim, max_dim)
            total += w * h * bytes_per_texel
        if total <= cfg.texture_memory_budget:
            break
        max_dim //= 2
    return max_dim


def build_texture_pool(infos: List[TextureInfo],
                       cfg: Optional[Config] = None,
                       progress=None, paired: Optional[bool] = None,
                       dtype=None, quad: Optional[bool] = None,
                       reference_exact: bool = False) -> DeviceTextures:
    """Decode all scene textures in parallel and build the device pool.
    Slot order: defaults 0..8, then `infos` in order (matching the
    SCENE_TEXTURE_OFFSET indexing contract). `paired`/`quad`/`dtype`
    override the pool-format defaults (pt.render.textures.POOL_*_DEFAULT);
    `reference_exact=True` forces the f32 flat-row pool in one flag
    (pairs with PathTracingSettings.reference_exact())."""
    cfg = cfg or get_config()
    if reference_exact:
        import jax.numpy as jnp
        paired = False if paired is None else paired
        quad = False if quad is None else quad
        dtype = jnp.float32 if dtype is None else dtype
    infos = [get_texture_info(i) for i in infos]
    max_dim = _budget_max_dim(infos, cfg)

    decoded: List[Optional[object]] = [None] * len(infos)

    def work(i: int) -> None:
        # DDS with authored mips: ingest the chain, dropping leading levels
        # to honor the budget cap (pre-mipped data makes downscaling free)
        mips = load_texture_mips(infos[i])
        if mips is not None:
            while (len(mips) > 1
                   and max(mips[0].shape[0], mips[0].shape[1]) > max_dim):
                mips = mips[1:]
            decoded[i] = ("mips", mips)
        else:
            px = load_texture_pixels(infos[i])
            if px is not None:
                px = _downscale_to(px, max_dim)
                decoded[i] = ("img", px)
        if progress:
            progress(infos[i].name)

    if infos:
        ThreadDispatch(cfg.loader_thread_count).dispatch_blocking(len(infos),
                                                                  work)

    builder = TexturePoolBuilder(paired=paired, quad=quad)
    add_default_textures(builder)
    for info, item in zip(infos, decoded):
        if item is None:
            # broken texture → 1x1 magenta placeholder keeps table indices
            # stable while flagging the asset visually
            builder.add(np.asarray([[[1.0, 0.0, 1.0, 1.0]]], np.float32),
                        srgb=False, generate_mips=False)
        elif item[0] == "mips":
            builder.add_mips(item[1], srgb=info.is_srgb)
        else:
            builder.add(item[1], srgb=info.is_srgb, generate_mips=True)
    return builder.build(dtype=dtype)


def build_scene_textures(scene, cfg: Optional[Config] = None,
                         progress=None, paired: Optional[bool] = None,
                         dtype=None, quad: Optional[bool] = None,
                         reference_exact: bool = False) -> DeviceTextures:
    return build_texture_pool(scene.textures, cfg, progress,
                              paired=paired, dtype=dtype, quad=quad,
                              reference_exact=reference_exact)
