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
    # rotate into new frame; R^T v written as multiply-reduce so the
    # (env x body)-vmapped call stays on the VPU (see inertia_in_com_frame)
    new_w = jnp.sum(rotnew2old * new_w[:, None], axis=0)
    new_l = jnp.sum(rotnew2old * new_l[:, None], axis=0)
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

    TPU note: written entirely in elementwise mul/add (no 3x3 dot_general).
    This function is vmapped over (env x body) — hundreds of thousands of
    3x3 matmul chains per substep lower to MXU dot_generals padded from 3 to
    full tiles (and 6 passes each under matmul precision "highest"); the
    explicit row-dot form runs on the VPU at full f32 precision instead.

    Reference behavior consumed via mujoco-mjx (SURVEY.md section 2b).
    """
    r = ximat
    # I_world_ij = sum_k I_k R_ik R_jk: row-dot products of R scaled by I
    ri = r * body_inertia[None, :]  # column k scaled by I_k
    i00 = jnp.sum(ri[0] * r[0])
    i11 = jnp.sum(ri[1] * r[1])
    i22 = jnp.sum(ri[2] * r[2])
    i01 = jnp.sum(ri[0] * r[1])
    i02 = jnp.sum(ri[0] * r[2])
    i12 = jnp.sum(ri[1] * r[2])
    d = xipos - com
    dd = jnp.sum(d * d)
    # parallel axis: I += m*(d.d*E - d d^T)
    m = body_mass
    h = m * d
    return jnp.concatenate(
        [
            jnp.stack(
                [
                    i00 + m * (dd - d[0] * d[0]),
                    i11 + m * (dd - d[1] * d[1]),
                    i22 + m * (dd - d[2] * d[2]),
                    i01 - m * d[0] * d[1],
                    i02 - m * d[0] * d[2],
                    i12 - m * d[1] * d[2],
                ]
            ),
            h,
            m[None],
        ]
    )
