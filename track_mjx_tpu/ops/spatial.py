"""6D spatial-vector algebra in MuJoCo layout: [angular(3); linear(3)].

Used by the com/crb/rne stages of the physics pipeline. All functions operate
on single vectors/inertias and are vmapped over bodies/dofs/envs by callers.

Conventions follow MuJoCo's com-based frame machinery (mju_transformSpatial,
mju_crossMotion, mju_crossForce, mju_mulInertVec): a spatial motion vector v =
[w; v_lin], a spatial force f = [torque; force], and a compact 10-parameter
inertia cinert = [Ixx Iyy Izz Ixy Ixz Iyz; m*c (3); m] ... MuJoCo actually
stores cinert as (10,) = upper-triangular inertia (6), mass*com offset (3),
mass (1). We keep that exact layout so stages can be unit-checked against
MjData.cinert directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def motion_cross(v: jax.Array, u: jax.Array) -> jax.Array:
    """Cross product of motion vectors: v x u (mju_crossMotion).

    res[:3] = w_v x w_u ; res[3:] = w_v x u_lin + v_lin x w_u
    """
    w_v, l_v = v[:3], v[3:]
    w_u, l_u = u[:3], u[3:]
    return jnp.concatenate(
        [jnp.cross(w_v, w_u), jnp.cross(w_v, l_u) + jnp.cross(l_v, w_u)]
    )


def force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
    """Cross product of a motion vector with a force vector (mju_crossForce)."""
    w_v, l_v = v[:3], v[3:]
    t_f, f_f = f[:3], f[3:]
    return jnp.concatenate(
        [jnp.cross(w_v, t_f) + jnp.cross(l_v, f_f), jnp.cross(w_v, f_f)]
    )


def inert_mul(i: jax.Array, v: jax.Array) -> jax.Array:
    """f = I * v for compact 10-parameter inertia (mju_mulInertVec).

    i = [i0..i5 (Ixx Iyy Izz Ixy Ixz Iyz), h0 h1 h2 (m*com), m]
    """
    w, l = v[:3], v[3:]
    ixx, iyy, izz, ixy, ixz, iyz = i[0], i[1], i[2], i[3], i[4], i[5]
    h = i[6:9]
    m = i[9]
    torque = jnp.stack(
        [
            ixx * w[0] + ixy * w[1] + ixz * w[2],
            ixy * w[0] + iyy * w[1] + iyz * w[2],
            ixz * w[0] + iyz * w[1] + izz * w[2],
        ]
    ) + jnp.cross(h, l)
    force = m * l - jnp.cross(h, w)
    return jnp.concatenate([torque, force])


def transform_motion(vec: jax.Array, offset: jax.Array, rotnew2old: jax.Array) -> jax.Array:
    """Transforms a motion vector between frames (mju_transformSpatial, force=0).

    offset = new_origin - old_origin (in old/world coordinates); rotnew2old is
    the 3x3 rotation mapping new-frame coordinates to old-frame coordinates
    (pass identity for pure translation).
    """
    w, l = vec[:3], vec[3:]
    # translate: linear picks up w x offset... MuJoCo: newlin = lin - offset x w
    new_l = l - jnp.cross(offset, w)
    new_w = w
    # rotate into new frame
    new_w = rotnew2old.T @ new_w
    new_l = rotnew2old.T @ new_l
    return jnp.concatenate([new_w, new_l])


def transform_force(vec: jax.Array, offset: jax.Array) -> jax.Array:
    """Translates a force vector to a new application point.

    offset = new_origin - old_origin (world frame); torque picks up -offset x f.
    """
    t, f = vec[:3], vec[3:]
    return jnp.concatenate([t - jnp.cross(offset, f), f])


def inertia_in_com_frame(
    body_mass: jax.Array,
    body_inertia: jax.Array,
    ximat: jax.Array,
    xipos: jax.Array,
    com: jax.Array,
) -> jax.Array:
    """Body inertia re-expressed about `com` in the world axes, compact layout.

    Mirrors mj_comPos's cinert computation: I_world = R diag(I) R^T shifted by
    d = xipos - com using the parallel axis theorem, h = m*d, layout
    [Ixx Iyy Izz Ixy Ixz Iyz, h, m].

    Reference behavior consumed via mujoco-mjx (SURVEY.md section 2b).
    """
    r = ximat
    i_world = r @ jnp.diag(body_inertia) @ r.T
    d = xipos - com
    dd = jnp.dot(d, d)
    # parallel axis: I += m*(d.d*E - d d^T)
    i_off = body_mass * (dd * jnp.eye(3, dtype=d.dtype) - jnp.outer(d, d))
    i_tot = i_world + i_off
    h = body_mass * d
    return jnp.concatenate(
        [
            jnp.stack(
                [
                    i_tot[0, 0],
                    i_tot[1, 1],
                    i_tot[2, 2],
                    i_tot[0, 1],
                    i_tot[0, 2],
                    i_tot[1, 2],
                ]
            ),
            h,
            body_mass[None],
        ]
    )
