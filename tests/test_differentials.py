"""Ray-differential tests: UV footprint math and mip selection through the
full render path (≙ tracing.glsl + textureGrad usage)."""

import numpy as np
import jax.numpy as jnp

from pt.render.differentials import (DiffRays, compute_dp_dxy,
                                     compute_dpn_duv, compute_lod,
                                     compute_uv_derivatives)


def test_dpduv_unit_square():
    """A unit quad with UVs matching XY: dpdu = +X, dpdv = +Y."""
    n = 1
    p0 = jnp.asarray([[0.0, 0, 0]])
    p1 = jnp.asarray([[1.0, 0, 0]])
    p2 = jnp.asarray([[0.0, 1, 0]])
    uv0 = jnp.asarray([[0.0, 0]])
    uv1 = jnp.asarray([[1.0, 0]])
    uv2 = jnp.asarray([[0.0, 1]])
    nrm = jnp.asarray([[0.0, 0, 1]])
    dpdu, dpdv, dndu, dndv = compute_dpn_duv(
        p0, p1, p2, uv0, uv1, uv2, nrm, nrm, nrm,
        jnp.asarray([[1.0, 0, 0]]), jnp.asarray([[0.0, 1, 0]]))
    np.testing.assert_allclose(np.asarray(dpdu), [[1, 0, 0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(dpdv), [[0, 1, 0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(dndu), 0.0, atol=1e-6)


def test_uv_footprint_scales_with_distance():
    """One-pixel-offset rays from further away produce larger UV footprints
    → higher LOD (the core textureGrad behavior)."""
    normal = jnp.asarray([[0.0, 0, 1]])
    dpdu = jnp.asarray([[1.0, 0, 0]])
    dpdv = jnp.asarray([[0.0, 1, 0]])

    def lod_at(dist):
        o = jnp.asarray([[0.0, 0, -dist]])
        d = jnp.asarray([[0.0, 0, 1]])
        # offset directions ≈ 1e-3 radian per "pixel"
        rx = DiffRays(o, jnp.asarray([[1e-3, 0, 1]]) / np.sqrt(1 + 1e-6),
                      o, jnp.asarray([[0, 1e-3, 1]]) / np.sqrt(1 + 1e-6))
        p = jnp.asarray([[0.0, 0, 0]])
        dpdx, dpdy = compute_dp_dxy(p, rx, normal)
        duv_x, duv_y = compute_uv_derivatives(dpdx, dpdy, dpdu, dpdv)
        return float(compute_lod(duv_x, duv_y)[0])

    near = lod_at(1.0)
    far = lod_at(16.0)
    assert far > near
    np.testing.assert_allclose(far - near, 4.0, atol=0.1)   # log2(16)


def test_render_uses_mips_at_distance(tmp_path):
    """A checkerboard-textured quad far away must converge to the mip
    average (0.5) instead of aliasing to near 0/1 values."""
    from pt.core.camera import InputCamera
    from pt.render.integrator import PathTracingSettings, render_image_stats
    from pt.render.textures import TexturePoolBuilder, add_default_textures
    from pt.scene.builder import SceneBuilder
    from pt.scene.types import (Geometry, MeshInfo,
                                MetallicRoughnessMaterial,
                                SCENE_TEXTURE_OFFSET)

    checker = (np.indices((64, 64)).sum(0) % 2).astype(np.float32)
    checker = np.repeat(checker[..., None], 3, axis=-1)

    b = SceneBuilder("mips")
    mat = b.add_material("m", MetallicRoughnessMaterial(
        emissive_color=(0, 0, 0), emissive_intensity=1.0,
        emissive_idx=SCENE_TEXTURE_OFFSET))
    # big quad, UVs tiled 50x so one pixel covers many texels from afar
    verts = [(-50, -50, 0), (50, -50, 0), (50, 50, 0), (-50, 50, 0)]
    uvs = [(0, 0), (50, 0), (50, 50), (0, 50)]
    nrm = [(0, 0, -1)] * 4
    vbase = b.add_vertices(verts, uvs, nrm)
    ibase = b.add_indices([0, 1, 2, 2, 3, 0])
    geo = b.add_geometry(Geometry(vbase, 4, ibase, 6, True))
    model = b.add_model([MeshInfo(geo, mat)])
    node = b.add_scene_node(0, np.eye(4))
    b.add_model_instance(model, node)
    b.add_camera(InputCamera(45, 0.1, 1000, (0, 0, -40.0), (0, 0, 1)))
    scene = b.create_scene()

    pool_b = TexturePoolBuilder()
    add_default_textures(pool_b)
    pool_b.add(checker, generate_mips=True)
    tex = pool_b.build()
    assert not tex.all_constant

    from pt.scene.flatten import flatten_scene
    ds = flatten_scene(scene)
    cam = scene.cameras[0]
    cam.on_resize(32, 32)
    img, _ = render_image_stats(ds, tex, cam.inv_view, cam.inv_proj,
                                32, 32, 0,
                                PathTracingSettings(1, 1, backend="brute"))
    img = np.asarray(img)
    center = img[8:24, 8:24, 0]
    # with mips the distant checker reads near its average; without them
    # pixels alias to values near 0 or 1
    frac_mid = ((center > 0.2) & (center < 0.8)).mean()
    assert frac_mid > 0.8, f"aliasing detected, mid fraction {frac_mid}"
