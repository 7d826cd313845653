"""Quaternion math for rigid-molecule rotations.

Rebuild of the reference's quaternion layer (SURVEY.md §2 "Quaternion math",
src/main/quaternion.c [M]): random uniform rotations for the rotate /
insert Monte Carlo moves, applied to atom coordinates about the molecular
center of mass.  Quaternions are (w, x, y, z), unit norm.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def qmul(q1, q2):
    """Hamilton product, supports leading batch dims."""
    w1, v1 = q1[..., :1], q1[..., 1:]
    w2, v2 = q2[..., :1], q2[..., 1:]
    w = w1 * w2 - jnp.sum(v1 * v2, axis=-1, keepdims=True)
    v = w1 * v2 + w2 * v1 + jnp.cross(v1, v2)
    return jnp.concatenate([w, v], axis=-1)


def qconj(q):
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def rotate(v, q):
    """Rotate vector(s) v by unit quaternion q.  v: (..., 3), q: (..., 4).

    Uses v' = v + 2 qw (qv x v) + 2 qv x (qv x v) — no matrix build.
    """
    qw = q[..., :1]
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def from_axis_angle(axis, angle):
    """Unit quaternion for rotation by ``angle`` (rad) about unit ``axis``."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1)


def random_uniform(key, shape=()):
    """Uniform random rotation quaternion(s) (Shoemake's method)."""
    u = jax.random.uniform(key, shape + (3,))
    u1, u2, u3 = u[..., 0], u[..., 1], u[..., 2]
    a = jnp.sqrt(1.0 - u1)
    b = jnp.sqrt(u1)
    t2 = 2.0 * jnp.pi * u2
    t3 = 2.0 * jnp.pi * u3
    return jnp.stack(
        [a * jnp.sin(t2), a * jnp.cos(t2), b * jnp.sin(t3), b * jnp.cos(t3)],
        axis=-1)


def random_small(key, max_angle, shape=()):
    """Random rotation by a uniform angle in [0, max_angle) about a random
    axis — the reference's tunable ``rot_factor`` rotation move
    (SURVEY.md §2 "Moves / checkpoint")."""
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, shape + (3,))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    angle = jax.random.uniform(k2, shape) * max_angle
    return from_axis_angle(axis, angle)
