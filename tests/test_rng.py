"""RNG parity tests: the jnp xorshift/jenkins chain must match a scalar
reference implementation bit-for-bit (≙ the sequences of
Shaders/common.glsl:133-165, which golden-image parity depends on)."""

import numpy as np
import jax.numpy as jnp

from pt.render import rng as prng


def _jenkins_scalar(x):
    x &= 0xFFFFFFFF
    x = (x + (x << 10)) & 0xFFFFFFFF
    x ^= x >> 6
    x = (x + (x << 3)) & 0xFFFFFFFF
    x ^= x >> 11
    x = (x + (x << 15)) & 0xFFFFFFFF
    return x


def _xorshift_scalar(s):
    s ^= (s << 13) & 0xFFFFFFFF
    s ^= s >> 17
    s ^= (s << 5) & 0xFFFFFFFF
    return s & 0xFFFFFFFF


def test_jenkins_matches_scalar():
    xs = np.array([0, 1, 2, 12345, 0xDEADBEEF, 0xFFFFFFFF], np.uint32)
    got = np.asarray(prng.jenkins_hash(jnp.asarray(xs)))
    want = np.array([_jenkins_scalar(int(x)) for x in xs], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_xorshift_matches_scalar():
    s = np.uint32(0x1234ABCD)
    state = jnp.asarray(np.array([s]))
    scalar = int(s)
    for _ in range(100):
        state = prng.xorshift(state)
        scalar = _xorshift_scalar(scalar)
        assert int(np.asarray(state)[0]) == scalar


def test_init_rng_matches_reference_formula():
    # state = jenkins(pix.x + pix.y*width ^ jenkins(frame))
    px, py, width, frame = 13, 27, 640, 42
    got = int(np.asarray(prng.init_rng(jnp.asarray(np.uint32(px)),
                                       jnp.asarray(np.uint32(py)),
                                       width, frame)))
    lin = (px + py * width) & 0xFFFFFFFF
    want = _jenkins_scalar(lin ^ _jenkins_scalar(frame))
    assert got == want


def test_uint_to_float_range_and_value():
    xs = np.array([0, 1, 0x80000000, 0xFFFFFFFF, 0x3F000000], np.uint32)
    f = np.asarray(prng.uint_to_float(jnp.asarray(xs)))
    assert ((f >= 0.0) & (f < 1.0)).all()
    # bit-splice semantics: 0x80000000 >> 9 = top mantissa bit → 0.5
    assert f[2] == 0.5
    assert f[0] == 0.0


def test_rand_uniformity():
    state = prng.jenkins_hash(jnp.arange(1 << 16, dtype=jnp.uint32))
    _, u = prng.rand(state)
    u = np.asarray(u)
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(np.percentile(u, 25) - 0.25) < 0.02
