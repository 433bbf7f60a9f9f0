"""Alpha-test / decal / transparent-shadow semantics tests
(≙ anyhit.rahit + occlusionAnyhit.rahit behavior)."""

import numpy as np
import pytest
import jax.numpy as jnp

from pt.core.camera import InputCamera
from pt.render.integrator import (PathTracingSettings, prepare_accel,
                                  trace_closest_alpha, trace_occluded_alpha)
from pt.render.textures import default_texture_pool, TexturePoolBuilder, add_default_textures
from pt.scene.builder import SceneBuilder
from pt.scene.examples import _add_quad_list
from pt.scene.flatten import flatten_scene
from pt.scene.types import (Geometry, MeshInfo, MetallicRoughnessMaterial,
                            SCENE_TEXTURE_OFFSET)


def _quad(builder, z, opaque=True, material=None):
    verts = [((-1, -1, z), (0, 0), (0, 0, -1), (1, 0, 0), (0, 1, 0)),
             ((1, -1, z), (1, 0), (0, 0, -1), (1, 0, 0), (0, 1, 0)),
             ((1, 1, z), (1, 1), (0, 0, -1), (1, 0, 0), (0, 1, 0)),
             ((-1, 1, z), (0, 1), (0, 0, -1), (1, 0, 0), (0, 1, 0))]
    pos = [v[0] for v in verts]
    uv = [v[1] for v in verts]
    nrm = [v[2] for v in verts]
    vbase = builder.add_vertices(pos, uv, nrm)
    ibase = builder.add_indices([0, 1, 2, 2, 3, 0])
    return builder.add_geometry(Geometry(vbase, 4, ibase, 6, opaque))


def _scene_with_alpha(front_alpha: float):
    """Opaque back wall at z=2 behind a non-opaque quad at z=1 whose base
    color alpha is `front_alpha`."""
    b = SceneBuilder("alpha")
    front_mat = b.add_material("front", MetallicRoughnessMaterial(
        color=(0.2, 0.4, 0.9, front_alpha)))
    back_mat = b.add_material("back", MetallicRoughnessMaterial(
        color=(1.0, 1.0, 1.0, 1.0)))
    gf = _quad(b, 1.0, opaque=False)
    gb = _quad(b, 2.0, opaque=True)
    model = b.add_model([MeshInfo(gf, front_mat), MeshInfo(gb, back_mat)])
    node = b.add_scene_node(0, np.eye(4))
    b.add_model_instance(model, node)
    b.add_camera(InputCamera(45, 0.1, 100, (0, 0, 0), (0, 0, 1)))
    return b.create_scene()


def _setup(front_alpha):
    scene = _scene_with_alpha(front_alpha)
    ds = flatten_scene(scene)
    assert ds.has_alpha
    tex = default_texture_pool()
    accel = prepare_accel(ds, PathTracingSettings(backend="brute"))
    n = 4
    o = jnp.zeros((n, 3))
    d = jnp.asarray(np.tile(np.array([[0, 0, 1]], np.float32), (n, 1)))
    return ds, tex, accel, o, d


def test_alpha_below_half_skips_and_records_decal():
    ds, tex, accel, o, d = _setup(front_alpha=0.3)
    hit, d_color, d_alpha, d_has = trace_closest_alpha(
        ds, tex, accel, o, d, jnp.ones((4,), bool))
    # ray passes the α=0.3 quad and lands on the back wall at t≈2
    np.testing.assert_allclose(np.asarray(hit.t), 2.0, atol=1e-3)
    assert bool(np.asarray(d_has).all())
    np.testing.assert_allclose(np.asarray(d_alpha), 0.3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_color)[0], [0.2, 0.4, 0.9],
                               atol=1e-6)


def test_alpha_above_half_accepts_hit():
    ds, tex, accel, o, d = _setup(front_alpha=0.7)
    hit, _, _, d_has = trace_closest_alpha(
        ds, tex, accel, o, d, jnp.ones((4,), bool))
    np.testing.assert_allclose(np.asarray(hit.t), 1.0, atol=1e-3)
    assert not bool(np.asarray(d_has).any())


def test_shadow_transparency():
    # α < 1 passes light even when ≥ 0.5 (occlusionAnyhit rule differs
    # from the primary-ray 0.5 threshold)
    ds, tex, accel, o, d = _setup(front_alpha=0.7)
    occ = trace_occluded_alpha(ds, tex, accel, o, d, jnp.full((4,), 1.5))
    assert not bool(np.asarray(occ).any())       # only the α=0.7 quad in range
    occ2 = trace_occluded_alpha(ds, tex, accel, o, d, jnp.full((4,), 3.0))
    assert bool(np.asarray(occ2).all())          # opaque back wall blocks


def test_opaque_scene_bypasses_alpha_path():
    from pt.scene.examples import make_default_scene
    ds = flatten_scene(make_default_scene())
    assert not ds.has_alpha


def test_full_render_with_decal():
    from pt.render.integrator import render_image_stats
    scene = _scene_with_alpha(0.3)
    ds = flatten_scene(scene)
    tex = default_texture_pool()
    cam = scene.cameras[0]
    cam.on_resize(16, 16)
    img, _ = render_image_stats(ds, tex, cam.inv_view, cam.inv_proj,
                                16, 16, 0,
                                PathTracingSettings(2, 3, backend="brute"))
    img = np.asarray(img)
    assert np.isfinite(img).all()
    # center pixels see the white wall tinted bluish by the decal
    center = img[8, 8] / max(img[8, 8].max(), 1e-9)
    assert center[2] >= center[0]


class TestOpaqueBitPages:
    """Page-id alpha tagging for the occlusion fast path
    (pt/accel/pallas_bvh.py: ALPHA_TRI_BIT)."""

    def test_woop_pages_tag_and_strip(self):
        import numpy as np
        import jax.numpy as jnp
        from pt.accel.pallas_bvh import (ALPHA_TRI_BIT, _strip_alpha_bit,
                                         _woop_pages)
        t = 32
        v0 = np.zeros((t, 3), np.float32)
        e1 = np.tile(np.asarray([[1, 0, 0]], np.float32), (t, 1))
        e2 = np.tile(np.asarray([[0, 1, 0]], np.float32), (t, 1))
        ids = np.arange(t, dtype=np.int32)
        ids[-1] = -1                                 # padding slot
        alpha = np.zeros(t, bool)
        alpha[3] = alpha[7] = True
        alpha[-1] = True                             # must NOT tag padding
        pages = _woop_pages(v0, e1, e2, ids, 1, t, tri_alpha=alpha)
        got = np.ascontiguousarray(
            np.asarray(pages)[0, 0, 6 * t:7 * t]).view(np.int32)
        assert got[3] == 3 | ALPHA_TRI_BIT
        assert got[7] == 7 | ALPHA_TRI_BIT
        assert got[4] == 4
        assert got[-1] == -1                         # padding untouched
        stripped = np.asarray(_strip_alpha_bit(jnp.asarray(got)))
        assert stripped[3] == 3 and stripped[7] == 7
        assert stripped[-1] == -1

    def test_morton_build_tags(self):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from pt.accel.pallas_bvh import ALPHA_TRI_BIT, build_packet_bvh
        rng = np.random.default_rng(0)
        n = 48
        pos = jnp.asarray(rng.normal(size=(n * 3, 3)).astype(np.float32))
        tri = jnp.arange(n * 3, dtype=jnp.int32).reshape(n, 3)
        opaque = jnp.asarray(rng.random(n) > 0.5)
        bvh = jax.jit(build_packet_bvh,
                      static_argnames=("block",))(pos, tri,
                                                  tri_opaque=opaque)
        ids = np.asarray(jax.lax.bitcast_convert_type(
            bvh.pages[..., 6 * bvh.block:7 * bvh.block], jnp.int32)).ravel()
        valid = ids[ids != -1]
        tagged = (valid & ALPHA_TRI_BIT) != 0
        plain = valid & ~ALPHA_TRI_BIT
        expected = ~np.asarray(opaque)[plain]
        np.testing.assert_array_equal(tagged, expected)
