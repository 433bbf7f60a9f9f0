"""Scene graph, builder, camera, and sampling-distribution tests."""

import math

import numpy as np
import jax.numpy as jnp

from pt.core.camera import (InputCamera, look_at_lh, perspective_fov_lh_zo)
from pt.render.sampling import (sample_cosine_hemisphere,
                                sample_uniform_disk_concentric)
from pt.scene.graph import (Animation, AnimationNode, KeySequence, SceneGraph,
                            trs_matrix)


def test_graph_propagation():
    # root → child(translate x+1) → grandchild(translate y+2)
    t1 = np.eye(4); t1[0, 3] = 1.0
    t2 = np.eye(4); t2[1, 3] = 2.0
    g = SceneGraph(np.array([0, 0, 1]), np.stack([np.eye(4), t1, t2]))
    np.testing.assert_allclose(g.current[2][:3, 3], [1.0, 2.0, 0.0])


def test_graph_absolute_override():
    t1 = np.eye(4); t1[0, 3] = 5.0
    t2 = np.eye(4); t2[1, 3] = 7.0
    g = SceneGraph(np.array([0, 0, 1]), np.stack([np.eye(4), t1, t2]),
                   is_relative=np.array([True, True, False]))
    np.testing.assert_allclose(g.current[2][:3, 3], [0.0, 7.0, 0.0])


def test_graph_preorder_assertion():
    import pytest
    with pytest.raises(AssertionError):
        SceneGraph(np.array([0, 2, 1]), np.stack([np.eye(4)] * 3))


def test_animation_keyframes():
    nodes = [AnimationNode(
        scene_node_index=1,
        positions=KeySequence(np.array([0.0, 10.0]),
                              np.array([[0, 0, 0], [10, 0, 0.]])),
        rotations=KeySequence(np.array([0.0, 10.0]),
                              np.array([[1, 0, 0, 0], [1, 0, 0, 0.]]),
                              is_rotation=True),
        scales=KeySequence(np.array([0.0, 10.0]),
                           np.array([[1, 1, 1], [1, 1, 1.]])),
    )]
    anim = Animation(nodes=nodes, ticks_per_second=1.0, duration=10.0)
    g = SceneGraph(np.array([0, 0]), np.stack([np.eye(4)] * 2),
                   animations=[anim])
    g.update(5.0)
    np.testing.assert_allclose(g.current[1][:3, 3], [5.0, 0.0, 0.0], atol=1e-9)
    # looping: 12 ticks ≡ 5+7-10 = 2 ticks
    g.update(7.0)
    np.testing.assert_allclose(g.current[1][:3, 3], [2.0, 0.0, 0.0], atol=1e-9)


def test_trs_matrix_quat_rotation():
    # 90° about z: quat (w,x,y,z) = (cos45, 0, 0, sin45)
    q = np.array([math.cos(math.pi / 4), 0, 0, math.sin(math.pi / 4)])
    m = trs_matrix(np.zeros(3), q, np.ones(3))
    np.testing.assert_allclose(m[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-12)


def test_camera_matrices_invertible_and_lh():
    view = look_at_lh(np.array([1.0, 2, 3]), np.array([1.0, 2, 4]),
                      np.array([0.0, -1, 0]))
    # forward (center-eye) maps to +z row in LH view space
    f = view[:3, :3] @ np.array([0, 0, 1.0])
    np.testing.assert_allclose(f, [0, 0, 1], atol=1e-12)
    proj = perspective_fov_lh_zo(math.radians(45), 640, 480, 0.1, 100.0)
    assert abs(np.linalg.det(proj)) > 0


def test_input_camera_pitch_clamp():
    cam = InputCamera(45, 0.1, 100, (0, 0, 0), (1, 0, 0))
    cam.rotate(0.0, -10000.0)     # huge upward look
    assert abs(cam._pitch) <= 89.0
    assert np.isfinite(cam.direction).all()


def test_input_camera_frame_delta_clamp():
    """A latency spike that batches hundreds of pixels of mouse motion
    into one flush must not slam the camera: on_update clamps the
    per-frame consumed delta to +-250 px (the reference polls the cursor
    per frame via GLFW so it never sees unbounded deltas)."""
    from pt.core.input import Input

    cam = InputCamera(45, 0.1, 100, (0, 0, 0), (0, 0, 1))
    ref = InputCamera(45, 0.1, 100, (0, 0, 0), (0, 0, 1))
    Input.set_mouse_button(1, True)
    try:
        Input.add_mouse_delta(5000.0, 0.0)
        cam.on_update(1 / 60)
        ref.rotate(250.0, 0.0)
        np.testing.assert_allclose(cam._yaw, ref._yaw)
    finally:
        Input.set_mouse_button(1, False)
        Input.consume_mouse_delta()


def test_concentric_disk_in_unit_circle():
    rng = np.random.default_rng(3)
    u1 = jnp.asarray(rng.random(4096, dtype=np.float32))
    u2 = jnp.asarray(rng.random(4096, dtype=np.float32))
    x, y = sample_uniform_disk_concentric(u1, u2)
    r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
    assert (r2 <= 1.0 + 1e-6).all()
    # area uniformity: mean r² of uniform disk = 0.5
    assert abs(r2.mean() - 0.5) < 0.02


def test_cosine_hemisphere_distribution():
    rng = np.random.default_rng(4)
    u1 = jnp.asarray(rng.random(1 << 14, dtype=np.float32))
    u2 = jnp.asarray(rng.random(1 << 14, dtype=np.float32))
    d = np.asarray(sample_cosine_hemisphere(u1, u2))
    assert (d[:, 2] >= 0).all()
    # E[cos θ] = 2/3 for cosine-weighted hemisphere
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.01
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_scene_update_resets_nothing_without_animation():
    from pt.scene.examples import make_default_scene
    scene = make_default_scene()
    assert scene.update(0.016) is False       # static scene, camera untouched
    assert not scene.has_animated_instances
