"""Counter-free per-ray RNG with exact semantics parity to the reference.

Reimplements the jenkinsHash/xorshift/uintToFloat chain of
Shaders/common.glsl:133-165 as vectorized uint32 jnp ops. Keeping the same
generator (rather than jax.random) preserves the reference's sequence
structure per (pixel, frame), which makes distribution tests comparable and
costs a handful of VPU ops per draw — far cheaper on TPU than threefry.

All functions are functional: state in, (state, value) out; state is a
uint32 array of any shape (one lane per ray).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_U32 = jnp.uint32


def jenkins_hash(x: jax.Array) -> jax.Array:
    """≙ jenkinsHash (common.glsl:134-142)."""
    x = x.astype(_U32)
    x = x + (x << 10)
    x = x ^ (x >> 6)
    x = x + (x << 3)
    x = x ^ (x >> 11)
    x = x + (x << 15)
    return x


def init_rng(pixel_x: jax.Array, pixel_y: jax.Array, width, frame) -> jax.Array:
    """≙ initRng (common.glsl:144-148): state = hash(pix.x + pix.y*width ^ hash(frame))."""
    lin = (pixel_x.astype(_U32) + pixel_y.astype(_U32) * _U32(width))
    seed = lin ^ jenkins_hash(jnp.asarray(frame, _U32))
    return jenkins_hash(seed)


def uint_to_float(x: jax.Array) -> jax.Array:
    """Map uint32 → [0,1): bit-splice into the float32 mantissa
    (≙ uintToFloat, common.glsl:150-153)."""
    bits = _U32(0x3F800000) | (x.astype(_U32) >> 9)
    return jax.lax.bitcast_convert_type(bits, jnp.float32) - 1.0


def xorshift(state: jax.Array) -> jax.Array:
    """One xorshift32 step (≙ xorshift, common.glsl:155-160)."""
    state = state ^ (state << 13)
    state = state ^ (state >> 17)
    state = state ^ (state << 5)
    return state


def rand(state: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Draw one float in [0,1) per lane (≙ rand, common.glsl:162-165)."""
    state = xorshift(state)
    return state, uint_to_float(state)


def rand2(state: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    state, a = rand(state)
    state, b = rand(state)
    return state, a, b


def rand3(state: jax.Array):
    state, a = rand(state)
    state, b = rand(state)
    state, c = rand(state)
    return state, a, b, c
