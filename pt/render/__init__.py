"""Render core: RNG, primary rays, shading math, BSDF, lights, materials,
textures, and the wavefront integrator. TPU counterpart of the reference's
device shaders (Shaders/*.glsl, raygen/closestHit/anyhit/miss)."""

from pt.render.integrator import PathTracingSettings, render_flat, render_image
from pt.render.bsdf import MaterialSample
from pt.render.textures import DeviceTextures, TexturePoolBuilder, default_texture_pool
