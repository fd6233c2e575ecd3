"""Quaternion and 3D rotation ops (MuJoCo conventions: wxyz, Hamilton product).

These are the scalar building blocks of the device-side physics engine and of
the egocentric observation math. Everything is written for a single element and
meant to be `jax.vmap`-ed; XLA fuses these elementwise chains into the
surrounding kernels.

Behavioral parity notes (vs the reference stack):
- `rotate` / `relative_quat` reproduce the formulas the reference uses from
  `brax.math` (reference: track_mjx/environment/walker/base.py:185-208).
- `mul`, `inv`, `to_mat`, `integrate` reproduce MuJoCo C semantics
  (mju_mulQuat, mju_negQuat, mju_quat2Mat, mju_quatIntegrate) which the
  reference consumes through mujoco-mjx.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mul(u: jax.Array, v: jax.Array) -> jax.Array:
    """Hamilton product u*v of wxyz quaternions (mju_mulQuat)."""
    return jnp.stack(
        [
            u[0] * v[0] - u[1] * v[1] - u[2] * v[2] - u[3] * v[3],
            u[0] * v[1] + u[1] * v[0] + u[2] * v[3] - u[3] * v[2],
            u[0] * v[2] - u[1] * v[3] + u[2] * v[0] + u[3] * v[1],
            u[0] * v[3] + u[1] * v[2] - u[2] * v[1] + u[3] * v[0],
        ]
    )


def inv(q: jax.Array) -> jax.Array:
    """Conjugate of a unit quaternion (mju_negQuat)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotate(vec: jax.Array, quat: jax.Array) -> jax.Array:
    """Rotates vec by quat; identical formula to brax.math.rotate.

    r = 2 (u.v) u + (s^2 - u.u) v + 2 s (u x v)
    """
    s, u = quat[0], quat[1:]
    r = 2.0 * (jnp.dot(u, vec) * u) + (s * s - jnp.dot(u, u)) * vec
    return r + 2.0 * s * jnp.cross(u, vec)


def rotate_inv(vec: jax.Array, quat: jax.Array) -> jax.Array:
    """Rotates vec by the inverse of quat."""
    return rotate(vec, inv(quat))


def relative_quat(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Relative quaternion from q1 to q2 (brax.math.relative_quat parity)."""
    return mul(q2, inv(q1))


def normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalizes to a unit quaternion."""
    return q / jnp.maximum(jnp.linalg.norm(q), eps)


def to_mat(q: jax.Array) -> jax.Array:
    """Unit quaternion -> 3x3 rotation matrix (mju_quat2Mat, row-major)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [
                1.0 - 2.0 * (y * y + z * z),
                2.0 * (x * y - w * z),
                2.0 * (x * z + w * y),
            ],
            [
                2.0 * (x * y + w * z),
                1.0 - 2.0 * (x * x + z * z),
                2.0 * (y * z - w * x),
            ],
            [
                2.0 * (x * z - w * y),
                2.0 * (y * z + w * x),
                1.0 - 2.0 * (x * x + y * y),
            ],
        ]
    )


def from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Axis-angle -> quaternion (mju_axisAngle2Quat); axis must be unit."""
    half = 0.5 * angle
    return jnp.concatenate([jnp.cos(half)[None], axis * jnp.sin(half)])


def integrate(q: jax.Array, vel: jax.Array, dt) -> jax.Array:
    """Integrates quaternion by angular velocity over dt (mju_quatIntegrate).

    `vel` is the 3D angular velocity in the same (local) frame MuJoCo uses for
    the corresponding joint; the result is normalized.
    """
    angle = jnp.linalg.norm(vel) * dt
    axis = vel / jnp.maximum(jnp.linalg.norm(vel), 1e-12)
    dq = from_axis_angle(axis, angle)
    return normalize(mul(q, dq))


def subtract(qa: jax.Array, qb: jax.Array) -> jax.Array:
    """3D velocity that rotates qb into qa over unit time (mju_subQuat)."""
    qdif = mul(inv(qb), qa)
    # axis-angle of qdif
    sin_a_2 = jnp.linalg.norm(qdif[1:])
    angle = 2.0 * jnp.arctan2(sin_a_2, qdif[0])
    # wrap to [-pi, pi]
    angle = jnp.where(angle > jnp.pi, angle - 2.0 * jnp.pi, angle)
    axis = qdif[1:] / jnp.maximum(sin_a_2, 1e-12)
    return axis * angle
