"""Post-processing: accumulation resolve, bloom, composition, tone mapping.

Fused jnp counterparts of the reference's post compute dispatch chain
(Renderer::RecordPostProcessCommands, Renderer.cpp:928+):

* resolve: accumulation / TotalSamples * Exposure with NaN→red / Inf→green
  sentinel pixels (postprocess.comp:18-27)
* Unity-style soft-knee bloom threshold curve (postprocess.comp:29-39)
* 13-tap downsample / 9-tap tent additive upsample pyramid over ≤13 mip
  levels (bloomDownsample.comp / bloomUpsample.comp, learnopengl PBB)
* composition: post += BloomIntensity * 0.1 * bloom (composition.comp:22-24)
* tone mapping: SDR 1−exp(−c), HDR passthrough (toneMapping.comp:20-22)
* HDR10 PQ encode for HDR output (uiComposition.comp:14-43)

XLA fuses the elementwise stages; the bloom taps are static-shaped resizes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List

import jax
import jax.numpy as jnp

MAX_BLOOM_MIP_LEVEL = 12   # ≙ MaxBloomMipmapLevel (ShaderRendererTypes.incl:68)


@dataclasses.dataclass(frozen=True)
class PostProcessSettings:
    """≙ PostProcessSettings (Renderer.h:68-73)."""
    exposure: float = 1.0
    bloom_threshold: float = 1.0
    bloom_intensity: float = 0.1
    enable_bloom: bool = True


def resolve_accumulation(accum, total_samples, exposure):
    """≙ postprocess.comp:18-27 (sentinels included)."""
    color = accum / jnp.maximum(total_samples, 1.0) * exposure
    is_nan = jnp.any(jnp.isnan(color), axis=-1, keepdims=True)
    is_inf = jnp.any(jnp.isinf(color), axis=-1, keepdims=True)
    color = jnp.where(is_nan, jnp.asarray([5000.0, 0.0, 0.0]), color)
    color = jnp.where(is_inf, jnp.asarray([0.0, 5000.0, 0.0]), color)
    return color


def bloom_threshold_curve(color, threshold, knee: float = 0.5):
    """Unity soft-knee prefilter (≙ postprocess.comp:29-39)."""
    br = jnp.max(color, axis=-1, keepdims=True)
    curve_x = threshold - knee
    curve_y = knee * 2.0
    curve_z = 0.25 / knee
    rq = jnp.clip(br - curve_x, 0.0, curve_y)
    rq = curve_z * rq * rq
    return color * (jnp.maximum(rq, br - threshold) / jnp.maximum(br, 1e-4))


def _sample_bilinear(img, uv_x, uv_y):
    """Clamp-to-edge bilinear lookup on a (H, W, 3) image with normalized
    UVs (the bloom passes sample with a linear clamped sampler,
    Renderer.cpp:115-121)."""
    h, w = img.shape[0], img.shape[1]
    x = uv_x * w - 0.5
    y = uv_y * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def fetch(xi, yi):
        xi = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        return img[yi, xi]

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


def _dst_uv_grid(dh, dw):
    ys = (jnp.arange(dh, dtype=jnp.float32) + 0.5) / dh
    xs = (jnp.arange(dw, dtype=jnp.float32) + 0.5) / dw
    return jnp.meshgrid(xs, ys)      # (uv_x, uv_y), each (dh, dw)


def bloom_downsample(src, dh: int, dw: int):
    """13-tap downsample (≙ bloomDownsample.comp:28-56)."""
    sh, sw = src.shape[0], src.shape[1]
    tx, ty = 1.0 / sw, 1.0 / sh
    ux, uy = _dst_uv_grid(dh, dw)
    s = lambda ox, oy: _sample_bilinear(src, ux + ox * tx, uy + oy * ty)
    a = s(-2, 2); b = s(0, 2); c = s(2, 2)
    d = s(-2, 0); e = s(0, 0); f = s(2, 0)
    g = s(-2, -2); h_ = s(0, -2); i = s(2, -2)
    j = s(-1, 1); k = s(1, 1); l = s(-1, -1); m = s(1, -1)
    return (e * 0.125 + (a + c + g + i) * 0.03125
            + (b + d + f + h_) * 0.0625 + (j + k + l + m) * 0.125)


def bloom_upsample_add(src, dst):
    """9-tap tent upsample of src added into dst
    (≙ bloomUpsample.comp:33-53)."""
    sh, sw = src.shape[0], src.shape[1]
    dh, dw = dst.shape[0], dst.shape[1]
    tx, ty = 1.0 / sw, 1.0 / sh
    ux, uy = _dst_uv_grid(dh, dw)
    s = lambda ox, oy: _sample_bilinear(src, ux + ox * tx, uy + oy * ty)
    a = s(-1, 1); b = s(0, 1); c = s(1, 1)
    d = s(-1, 0); e = s(0, 0); f = s(1, 0)
    g = s(-1, -1); h_ = s(0, -1); i = s(1, -1)
    up = (e * 4.0 + (b + d + f + h_) * 2.0 + (a + c + g + i)) / 16.0
    return dst + up


def bloom_pyramid(color, threshold):
    """Full bloom chain: threshold → down ladder → additive up ladder.
    Returns the mip-0 bloom image (added to color by the caller with
    intensity*0.1, composition.comp:22-24)."""
    h, w = color.shape[0], color.shape[1]
    levels: List = [bloom_threshold_curve(color, threshold)]
    sizes = [(h, w)]
    while len(levels) <= MAX_BLOOM_MIP_LEVEL:
        nh, nw = max(1, sizes[-1][0] // 2), max(1, sizes[-1][1] // 2)
        if (nh, nw) == sizes[-1]:
            break
        levels.append(bloom_downsample(levels[-1], nh, nw))
        sizes.append((nh, nw))
    for lvl in range(len(levels) - 1, 0, -1):
        levels[lvl - 1] = bloom_upsample_add(levels[lvl], levels[lvl - 1])
    return levels[0]


def tonemap_sdr(color):
    """Exponential SDR tonemap (≙ toneMapping.comp:20-22)."""
    return 1.0 - jnp.exp(-color)


def _srgb_to_linear(color):
    """Piecewise sRGB EOTF (≙ uiComposition.comp:41-48)."""
    low = color / 12.92
    high = ((color + 0.055) / 1.055) ** 2.4
    return jnp.where(color >= 0.0404482362771082, high, low)


def compose_ui(screen_color, ui_rgba):
    """Blend a UI overlay over the screen image
    (≙ uiComposition.comp:55-60: where ui.a > 0 the pixel becomes
    srgb_to_linear(ui.rgb) * 0.99 + screen.rgb * 0.01; PQ encode, when
    HDR, happens after this blend). `ui_rgba` is (H, W, 4) sRGB-encoded,
    float in [0,1] or uint8."""
    ui_rgba = jnp.asarray(ui_rgba)
    if ui_rgba.dtype == jnp.uint8:
        ui_rgba = ui_rgba.astype(jnp.float32) / 255.0
    blended = _srgb_to_linear(ui_rgba[..., :3]) * 0.99 + screen_color * 0.01
    return jnp.where(ui_rgba[..., 3:4] > 0.0, blended, screen_color)


def linear_to_hdr10(color, white_point: float = 203.0):
    """BT.2020 + ST.2084 PQ encode (≙ uiComposition.comp:14-43)."""
    m709to2020 = jnp.asarray([
        [0.6274040, 0.3292820, 0.0433136],
        [0.0690970, 0.9195400, 0.0113612],
        [0.0163916, 0.0880132, 0.8955950]])
    c = jnp.einsum("ij,...j->...i", m709to2020, color)
    c = c * (white_point / 10000.0)
    m1 = 2610.0 / 4096.0 / 4
    m2 = 2523.0 / 4096.0 * 128
    c1 = 3424.0 / 4096.0
    c2 = 2413.0 / 4096.0 * 32
    c3 = 2392.0 / 4096.0 * 32
    cp = jnp.abs(c) ** m1
    return ((c1 + c2 * cp) / (1 + c3 * cp)) ** m2


@functools.partial(jax.jit, static_argnames=("enable_bloom", "hdr"))
def _postprocess_jit(accum, total_samples, exposure, bloom_threshold,
                     bloom_intensity, enable_bloom: bool, hdr: bool,
                     ui=None):
    color = resolve_accumulation(accum, total_samples, exposure)
    if enable_bloom:
        bloom = bloom_pyramid(color, bloom_threshold)
        color = color + bloom_intensity * 0.1 * bloom
    if not hdr:
        color = tonemap_sdr(color)           # HDR mode passes through
    if ui is not None:
        color = compose_ui(color, ui)
    if hdr:
        color = linear_to_hdr10(color)
    return color


def postprocess(accum, total_samples, settings: PostProcessSettings,
                hdr: bool = False, ui=None):
    """Full post chain on an (H, W, 3) accumulation image → display-ready
    float image in [0,1] (SDR) or PQ-encoded (HDR). `ui`, when given, is
    an (H, W, 4) sRGB RGBA overlay composed after tone mapping and before
    the PQ encode, matching the reference's dispatch order (toneMapping →
    uiComposition, Renderer.cpp:1766-1776).

    Only the STRUCTURAL flags (enable_bloom, hdr) are jit statics; the
    exposure/bloom floats are traced operands, so dragging a viewer
    slider never recompiles the 13-level bloom chain (≙ push-constant
    updates vs pipeline rebuilds in the reference)."""
    return _postprocess_jit(accum, total_samples,
                            jnp.float32(settings.exposure),
                            jnp.float32(settings.bloom_threshold),
                            jnp.float32(settings.bloom_intensity),
                            settings.enable_bloom, hdr, ui)
