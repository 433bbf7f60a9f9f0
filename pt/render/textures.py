"""Device texture pool: flat texel buffer + per-(texture, mip) offset table.

TPU replacement for the reference's bindless sampler2D array
(closestHit.rchit:10 `textures[]`, 1024 slots) and hardware
textureGrad trilinear filtering (material.glsl). Design:

* All textures live in ONE flat (P, 4) texel pool; a (NT, MAX_MIPS) offset
  table + (NT, MAX_MIPS, 2) size table locate each mip. Texel fetch is a
  single dynamic gather into the pool — the only memory-access pattern that
  vectorizes well on TPU for per-ray divergent texture indices.
* sRGB decode happens at upload (the reference samples VK sRGB formats;
  here texels are stored linear, TextureUploader.cpp:571-595 analogue).
* Filtering: bilinear per mip + linear mip blend (trilinear), LOD from the
  ray-differential UV derivatives like textureGrad.
* Wrap mode: repeat (the reference's default sampler, Renderer.cpp:104-111).

Default texture slots 0..8 (ShaderTypes.incl:18-27) are 1x1 constants with
the reference's exact texel values (ShaderRendererTypes.incl:49-56).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_MIPS = 14   # up to 8192x8192


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceTextures:
    data: jax.Array        # (P, 4) linear texels — or (P, 8) when paired;
                           # f32 or bf16 rows (see build())
    offsets: jax.Array     # (NT, MAX_MIPS) i32 texel offset of each mip
    sizes: jax.Array       # (NT, MAX_MIPS, 2) i32 (w, h) per mip
    mip_counts: jax.Array  # (NT,) i32
    # static: every texture is a 1x1 constant (the default-texture-only
    # case) — sampling collapses to one gather per lookup, a large win since
    # TPU gathers are the shading bottleneck
    all_constant: bool = dataclasses.field(metadata=dict(static=True),
                                           default=False)
    # static: pair-duplicated rows — row i holds texel i AND its repeat-wrap
    # x-neighbor as one (8,) row, so both bilinear x-corners arrive in ONE
    # row gather instead of two (perf_budget §13 lever 2). Offset/stride
    # math is unchanged (row count == texel count); storage doubles, which
    # bf16 rows win back. (A stride-(w+1) contiguous-pair variant via
    # vmapped dynamic_slice was tested first: XLA materializes a
    # lane-padded (T(8,128)) copy of the whole pool for the slice — 32x
    # HBM, OOM at Sponza scale.)
    paired: bool = dataclasses.field(metadata=dict(static=True),
                                     default=False)
    # static: quad-duplicated rows — row i holds ALL FOUR bilinear corners
    # [(x,y), (x+1,y), (x,y+1), (x+1,y+1)] (repeat-wrap) as one (16,) row:
    # a full bilinear fetch is ONE row gather (trilinear = 2, nearest-mip
    # tail = 1). The round-5 extension of the pair lever: if gathers are
    # row-latency-bound (the §14 pair measurement says they are), halving
    # them again buys another step win at 4x base storage (2x net under
    # bf16 rows). Mutually exclusive with `paired`.
    quad: bool = dataclasses.field(metadata=dict(static=True),
                                   default=False)

    @property
    def count(self) -> int:
        return self.offsets.shape[0]


def srgb_to_linear(c: np.ndarray) -> np.ndarray:
    """IEC 61966-2-1 decode (≙ hardware sRGB sampling)."""
    c = np.asarray(c, np.float32)
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _downsample2x(img: np.ndarray) -> np.ndarray:
    """Box-filter 2x downsample (≙ the blit-based mip generation,
    Image.cpp:258-315 uses linear blits ≈ box filter)."""
    h, w = img.shape[:2]
    nh, nw = max(1, h // 2), max(1, w // 2)
    # a dimension already at 1 stays 1 (non-square chains end in Nx1/1xN
    # levels, like the blit chain's max(1, dim>>level))
    img = img[:nh * 2 if h > 1 else 1, :nw * 2 if w > 1 else 1]
    img = img.reshape(nh, -1, nw, img.shape[1] // nw, img.shape[-1])
    return img.mean(axis=(1, 3))


def build_mip_chain(pixels: np.ndarray) -> List[np.ndarray]:
    """Full mip pyramid down to 1x1."""
    mips = [pixels.astype(np.float32)]
    while mips[-1].shape[0] > 1 or mips[-1].shape[1] > 1:
        mips.append(_downsample2x(mips[-1]))
    return mips[:MAX_MIPS]


# Production pool-format defaults, measured on-chip in
# benches/texlevers_ab.py (docs/perf_budget.md §14, 2026-08-20).
# Paired rows are BIT-EXACT vs the unpaired pool (same texels, same
# filter weights; measured equal on the 2.1 GiB courtyard film) and cut
# a full 5-bounce step 21.6%. bf16 rows halve bytes/gather (paying back
# pair's 2x storage); the reference itself stores color textures as
# 8-bit sRGB / BCn blocks (TextureUploader.cpp:571-595), so bf16's 8
# mantissa bits meet or beat the reference's storage precision for
# every 8-bit-sourced texel (same-RNG film MSE 1.8e-4, far under the
# 1e-3 contract). TexturePoolBuilder callers can override per pool;
# dtype=jnp.float32 + paired=False reproduces the round-3 pool.
#
# Row-layout policy (round 5, VERDICT r4 task 6 — resolved by a
# SAME-DAY 4-arm A/B on the frozen 9.9 MiB r2 pool, which overturned
# the round-4 cross-round inference that row duplication hurt small
# pools): wider rows win MONOTONICALLY at every pool size measured —
# frozen small pool: flat-f32 0.492 / flat-bf16 0.524 / pair-bf16
# 0.553 / quad-bf16 0.576 Mrays/s; 2.1 GiB pool: pair −21.6% vs flat,
# quad a further −9.7% (docs/perf_budget.md §14.5). The r2→r4 drift on
# the frozen arm that motivated size gating was never the layout.
# Default: QUAD rows (all four bilinear corners per (16,) row — one
# gather per bilinear fetch) at every size; `paired`/flat stay as
# explicit overrides for A/B and reference_exact.
POOL_PAIRED_DEFAULT: Optional[bool] = None       # None = off (quad wins)
POOL_PAIR_MIN_TEXELS = 4 * 1024 * 1024           # retained for A/B refs
POOL_DTYPE_DEFAULT: object = jnp.bfloat16
POOL_QUAD_DEFAULT: Optional[bool] = None         # None = True (always)


class TexturePoolBuilder:
    """Accumulates decoded textures into the flat pool.

    `paired`: True/False force row pairing; None (default) decides at
    build() time by pool size (see POOL_PAIR_MIN_TEXELS above). Pairing
    never changes row counts, so the offset/size tables built during
    add() are pairing-independent."""

    def __init__(self, paired: Optional[bool] = None,
                 quad: Optional[bool] = None):
        self._levels: List[np.ndarray] = []      # (H, W, 4) f32 per mip
        self._offsets: List[np.ndarray] = []
        self._sizes: List[np.ndarray] = []
        self._mip_counts: List[int] = []
        self._cursor = 0
        self._has_hdr = False
        self.paired = POOL_PAIRED_DEFAULT if paired is None else paired
        self.quad = POOL_QUAD_DEFAULT if quad is None else quad

    def _push_level(self, m: np.ndarray) -> None:
        """Append one mip level's texels at the current cursor."""
        self._levels.append(np.ascontiguousarray(m, np.float32))
        self._cursor += m.shape[0] * m.shape[1]

    def _note_range(self, pixels: np.ndarray) -> None:
        """Track float/HDR-sourced content: texels outside [0,1] lose
        absolute precision under bf16 rows, and the reference keeps
        RGBAF32-sourced textures in f32 storage (TextureUploader::
        GetImageFormat maps RGBAF32 → R32G32B32A32Sfloat) — such pools
        default to f32 rows (see build())."""
        if not self._has_hdr and pixels.size:
            if float(pixels[..., :3].max(initial=0.0)) > 1.0 + 1e-3:
                self._has_hdr = True

    def add(self, pixels: np.ndarray, srgb: bool = False,
            generate_mips: bool = True) -> int:
        """pixels: (H, W, 4) float in [0,1] (or any float range for HDR).
        Returns the texture-table index."""
        pixels = np.asarray(pixels, np.float32)
        if pixels.ndim == 2:
            pixels = pixels[..., None]
        if pixels.shape[-1] == 1:                      # gray → RGB
            pixels = np.repeat(pixels, 3, axis=-1)
        elif pixels.shape[-1] == 2:                    # gray+alpha
            pixels = np.concatenate(
                [np.repeat(pixels[..., :1], 3, axis=-1), pixels[..., 1:]],
                -1)
        if pixels.shape[-1] == 3:
            pixels = np.concatenate([pixels, np.ones_like(pixels[..., :1])], -1)
        assert pixels.shape[-1] == 4, pixels.shape     # pool layout contract
        if srgb:
            pixels = np.concatenate([srgb_to_linear(pixels[..., :3]),
                                     pixels[..., 3:]], -1)
        self._note_range(pixels)
        mips = build_mip_chain(pixels) if generate_mips else [pixels]
        offsets = np.zeros(MAX_MIPS, np.int32)
        sizes = np.zeros((MAX_MIPS, 2), np.int32)
        for i, m in enumerate(mips):
            offsets[i] = self._cursor
            sizes[i] = (m.shape[1], m.shape[0])
            self._push_level(m)
        # clamp unused mip slots to the last mip (safe gather targets)
        for i in range(len(mips), MAX_MIPS):
            offsets[i] = offsets[len(mips) - 1]
            sizes[i] = sizes[len(mips) - 1]
        self._offsets.append(offsets)
        self._sizes.append(sizes)
        self._mip_counts.append(len(mips))
        return len(self._mip_counts) - 1

    def add_mips(self, mips: List[np.ndarray], srgb: bool = False) -> int:
        """Add a texture from a pre-built mip chain (≙ the pre-mipped BCn
        upload path, Image::UploadWithMips / TextureUploader DDS ingest).
        Each level (H, W, 4) float; levels beyond MAX_MIPS are dropped,
        missing tail levels are box-generated down to 1x1."""
        chain = []
        for m in mips[:MAX_MIPS]:
            m = np.asarray(m, np.float32)
            if m.shape[-1] == 3:
                m = np.concatenate([m, np.ones_like(m[..., :1])], -1)
            if srgb:
                m = np.concatenate([srgb_to_linear(m[..., :3]), m[..., 3:]],
                                   -1)
            self._note_range(m)
            chain.append(m)
        while (len(chain) < MAX_MIPS
               and (chain[-1].shape[0] > 1 or chain[-1].shape[1] > 1)):
            chain.append(_downsample2x(chain[-1]))
        offsets = np.zeros(MAX_MIPS, np.int32)
        sizes = np.zeros((MAX_MIPS, 2), np.int32)
        for i, m in enumerate(chain):
            offsets[i] = self._cursor
            sizes[i] = (m.shape[1], m.shape[0])
            self._push_level(m)
        for i in range(len(chain), MAX_MIPS):
            offsets[i] = offsets[len(chain) - 1]
            sizes[i] = sizes[len(chain) - 1]
        self._offsets.append(offsets)
        self._sizes.append(sizes)
        self._mip_counts.append(len(chain))
        return len(self._mip_counts) - 1

    def build(self, dtype=None) -> DeviceTextures:
        """dtype None → POOL_DTYPE_DEFAULT (f32 instead when any added
        texture carried HDR-range texels — see _note_range) → float32.
        bfloat16 rows halve the pool footprint and bytes/gather
        (perf_budget §13 lever 3); texels upcast to f32 after the
        gather, so only the stored values round (~2^-9 rel for
        8-bit-sourced texels). Pairing left unforced resolves here by
        pool size (POOL_PAIR_MIN_TEXELS)."""
        sizes = np.stack(self._sizes)
        if dtype is None:
            dtype = (jnp.float32 if self._has_hdr
                     and POOL_DTYPE_DEFAULT == jnp.bfloat16
                     else POOL_DTYPE_DEFAULT)
        quad = True if self.quad is None else self.quad
        paired = False if self.paired is None else self.paired
        if quad:
            paired = False                # mutually exclusive layouts
            # quad-duplicated rows: all four wrap-neighbor bilinear
            # corners per row — row count (and the offset math)
            # unchanged, width 16
            def quad_rows(m):
                rx = np.roll(m, -1, axis=1)
                ry = np.roll(m, -1, axis=0)
                rxy = np.roll(rx, -1, axis=0)
                return np.concatenate([m, rx, ry, rxy],
                                      axis=-1).reshape(-1, 16)
            texels = [quad_rows(m) for m in self._levels]
        elif paired:
            # pair-duplicated rows: [texel, wrap-x-neighbor] per row —
            # row count (and the offset math) unchanged, width 8
            texels = [np.concatenate([m, np.roll(m, -1, axis=1)],
                                     axis=-1).reshape(-1, 8)
                      for m in self._levels]
        else:
            texels = [m.reshape(-1, 4) for m in self._levels]
        data = jnp.asarray(np.concatenate(texels, axis=0))
        if dtype is not None:
            data = data.astype(dtype)
        return DeviceTextures(
            data=data,
            offsets=jnp.asarray(np.stack(self._offsets)),
            sizes=jnp.asarray(sizes),
            mip_counts=jnp.asarray(np.asarray(self._mip_counts, np.int32)),
            all_constant=bool((sizes[:, 0] == 1).all()),
            paired=paired,
            quad=quad,
        )


def add_default_textures(builder: TexturePoolBuilder) -> None:
    """Slots 0..8 with the reference's exact 1x1 texels
    (ShaderRendererTypes.incl:49-56; placeholder slot 8 reuses white)."""
    def const(rgba):
        builder.add(np.asarray(rgba, np.float32).reshape(1, 1, 4),
                    srgb=False, generate_mips=False)
    half = 128.0 / 255.0
    const([1, 1, 1, 1])                 # 0 color (white)
    const([half, half, 1, 1])           # 1 normal (0x80,0x80,0xff)
    const([1, 1, 1, 1])                 # 2 roughness
    const([1, 1, 1, 1])                 # 3 metalness
    const([0, 0, 0, 0])                 # 4 emissive (black)
    const([1, 1, 1, 1])                 # 5 specular
    const([0, 0, 0, 0])                 # 6 glossiness
    const([0, 0, 0, 0])                 # 7 shininess
    const([1, 1, 1, 1])                 # 8 placeholder


def default_texture_pool() -> DeviceTextures:
    b = TexturePoolBuilder()
    add_default_textures(b)
    return b.build()


def _bilinear_at_level(tex: DeviceTextures, tex_idx, uv, level):
    """Bilinear fetch of one mip level. tex_idx (N,), uv (N,2), level (N,)."""
    off = tex.offsets[tex_idx, level]                       # (N,)
    size = tex.sizes[tex_idx, level]                        # (N, 2)
    w = size[..., 0].astype(jnp.float32)
    h = size[..., 1].astype(jnp.float32)
    # repeat wrap, half-texel center convention
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    wi = size[..., 0]
    hi = size[..., 1]

    if tex.quad:
        # quad-duplicated rows: ONE (16,) row gather returns all four
        # bilinear corners (wrap-neighbors baked in at build)
        x0i = jnp.mod(x0.astype(jnp.int32), wi)
        y0i = jnp.mod(y0.astype(jnp.int32), hi)
        rows = tex.data[off + y0i * wi + x0i]               # (N, 16)
        c00 = rows[..., 0:4].astype(jnp.float32)
        c10 = rows[..., 4:8].astype(jnp.float32)
        c01 = rows[..., 8:12].astype(jnp.float32)
        c11 = rows[..., 12:16].astype(jnp.float32)
    elif tex.paired:
        # pair-duplicated rows: one (8,) row gather returns the (x0, x0+1)
        # corner pair — both bilinear x-corners per y in a single gather
        x0i = jnp.mod(x0.astype(jnp.int32), wi)

        def fetch_pair(yi):
            yi = jnp.mod(yi.astype(jnp.int32), hi)
            rows = tex.data[off + yi * wi + x0i]            # (N, 8)
            return (rows[..., :4].astype(jnp.float32),
                    rows[..., 4:].astype(jnp.float32))

        c00, c10 = fetch_pair(y0)
        c01, c11 = fetch_pair(y0 + 1)
    else:
        def fetch(xi, yi):
            xi = jnp.mod(xi.astype(jnp.int32), wi)
            yi = jnp.mod(yi.astype(jnp.int32), hi)
            return tex.data[off + yi * wi + xi].astype(jnp.float32)

        c00 = fetch(x0, y0)
        c10 = fetch(x0 + 1, y0)
        c01 = fetch(x0, y0 + 1)
        c11 = fetch(x0 + 1, y0 + 1)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def sample_texture_grad(tex: DeviceTextures, tex_idx, uv, dudx_dvdx=None,
                        dudy_dvdy=None, nearest_mip: bool = False):
    """Trilinear sample with LOD from UV derivatives (≙ textureGrad).

    tex_idx (N,) i32, uv (N,2). Derivatives (N,2) each or None for level 0.
    Returns (N,4) linear texels.

    nearest_mip (static): skip the second mip's bilinear fetch and sample
    the ROUNDED level only — 4 row gathers instead of 8 (perf_budget §13
    lever 1). Used on incoherent tail bounces, where the ≤half-level LOD
    error is film-invisible (MSE-gated, benches/tex_ab.py); primary-bounce
    samples keep full trilinear for the pixel-parity contract.
    """
    if tex.all_constant:
        # 1x1 constants: one gather, no filtering
        texel = tex.data[tex.offsets[tex_idx, 0]]
        return texel[..., :4].astype(jnp.float32)
    mip_count = tex.mip_counts[tex_idx]
    if dudx_dvdx is None:
        # explicit level-0 sampling: single bilinear fetch
        return _bilinear_at_level(tex, tex_idx, uv,
                                  jnp.zeros(uv.shape[:-1], jnp.int32))
    size0 = tex.sizes[tex_idx, 0].astype(jnp.float32)       # (N, 2)
    px = dudx_dvdx * size0
    py = dudy_dvdy * size0
    rho = jnp.sqrt(jnp.maximum(jnp.sum(px * px, -1), jnp.sum(py * py, -1)))
    level = jnp.log2(jnp.maximum(rho, 1e-12))
    level = jnp.clip(level, 0.0, (mip_count - 1).astype(jnp.float32))
    if nearest_mip:
        near = jnp.round(level).astype(jnp.int32)
        return _bilinear_at_level(tex, tex_idx, uv, near)
    lo = jnp.floor(level).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, mip_count - 1)
    frac = (level - lo.astype(jnp.float32))[..., None]
    a = _bilinear_at_level(tex, tex_idx, uv, lo)
    b = _bilinear_at_level(tex, tex_idx, uv, hi)
    return a * (1 - frac) + b * frac
