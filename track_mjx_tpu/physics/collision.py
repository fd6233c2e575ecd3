"""Narrowphase collision over the static candidate pair table.

TPU-first: the candidate pair set is computed once on the host (PhysicsPlan.
pair_groups, after contype/conaffinity, weld, parent-child and exclude
filtering — mirroring mj_collision's filters), so the device program has a
fixed contact count every step; "inactive" contacts simply carry positive
distance and draw zero force from the solver. For the rodent this is 14
plane-capsule + 2 plane-ellipsoid pairs (30 contact slots).

Geometry formulas follow MuJoCo's analytic narrowphase (mjc_PlaneSphere etc.);
frames follow mju_makeFrame. Reference consumes this via mjx (SURVEY.md 2b).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from track_mjx_tpu.physics.model import (
    Data,
    Model,
    PhysicsPlan,
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_ELLIPSOID,
    GEOM_PLANE,
    GEOM_SPHERE,
)


@struct.dataclass
class Contact:
    """Static-shape contact set (ncon slots)."""

    dist: jax.Array  # (ncon,)
    pos: jax.Array  # (ncon, 3)
    frame: jax.Array  # (ncon, 3, 3), rows = [normal, tangent1, tangent2]
    friction: jax.Array  # (ncon, 5)
    solref: jax.Array  # (ncon, 2)
    solimp: jax.Array  # (ncon, 5)
    includemargin: jax.Array  # (ncon,)


def make_frame(n: jax.Array) -> jax.Array:
    """Completes a right-handed frame from a unit normal (mju_makeFrame)."""
    ref = jnp.where(
        jnp.abs(n[1]) < 0.5,
        jnp.array([0.0, 1.0, 0.0], dtype=n.dtype),
        jnp.array([0.0, 0.0, 1.0], dtype=n.dtype),
    )
    t1 = ref - n * jnp.dot(n, ref)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2])


def _combine_params(model: Model, g1: np.ndarray, g2: np.ndarray):
    """Contact parameter mixing (mj_contactParam equal/priority rules)."""
    p1, p2 = model.geom_priority[g1], model.geom_priority[g2]
    s1, s2 = model.geom_solmix[g1], model.geom_solmix[g2]
    # equal-priority mixing weight
    denom = s1 + s2
    mix = jnp.where(denom > 1e-12, s1 / jnp.maximum(denom, 1e-12), 0.5)
    mix = jnp.where((s1 < 1e-12) & (s2 >= 1e-12), 0.0, mix)
    mix = jnp.where((s2 < 1e-12) & (s1 >= 1e-12), 1.0, mix)
    mix = jnp.where(p1 > p2, 1.0, jnp.where(p2 > p1, 0.0, mix))[:, None]

    ref1, ref2 = model.geom_solref[g1], model.geom_solref[g2]
    # standard (positive) solref mixes; direct (non-positive) takes min
    solref = jnp.where(
        (ref1[:, :1] > 0) & (ref2[:, :1] > 0),
        mix * ref1 + (1 - mix) * ref2,
        jnp.minimum(ref1, ref2),
    )
    solimp = mix * model.geom_solimp[g1] + (1 - mix) * model.geom_solimp[g2]

    fri_max = jnp.maximum(model.geom_friction[g1], model.geom_friction[g2])
    fri_pri = jnp.where(
        (p1 > p2)[:, None], model.geom_friction[g1], model.geom_friction[g2]
    )
    fri3 = jnp.where((p1 == p2)[:, None], fri_max, fri_pri)
    friction = jnp.stack(
        [fri3[:, 0], fri3[:, 0], fri3[:, 1], fri3[:, 2], fri3[:, 2]], axis=1
    )
    # empirically verified against MuJoCo 3.10: contact includemargin is the
    # SUM of the two geoms' margins (each geom inflated by its margin); gap
    # does not enter includemargin in this version
    includemargin = model.geom_margin[g1] + model.geom_margin[g2]
    return friction, solref, solimp, includemargin


def _plane_sphere(n, ppos, c, r):
    h = jnp.einsum("ij,ij->i", n, c - ppos)
    dist = h - r
    pos = c - n * (r + 0.5 * dist)[:, None]
    return dist, pos, n


def collide(plan: PhysicsPlan, model: Model, data: Data) -> tuple[Data, Contact]:
    """Runs narrowphase over all candidate pairs; returns fixed-shape contacts."""
    dtype = data.qpos.dtype
    dists, poss, frames = [], [], []
    fris, refs, imps, margins = [], [], [], []

    for t1, t2, g1, g2 in plan.pair_groups:
        npair = len(g1)
        fri, ref, imp, inc = _combine_params(model, g1, g2)
        x1, m1 = data.geom_xpos[g1], data.geom_xmat[g1]
        x2, m2 = data.geom_xpos[g2], data.geom_xmat[g2]
        sz1, sz2 = model.geom_size[g1], model.geom_size[g2]

        if (t1, t2) == (GEOM_PLANE, GEOM_SPHERE):
            n = m1[:, :, 2]
            d_, p_, _ = _plane_sphere(n, x1, x2, sz2[:, 0])
            con = [(d_, p_, n)]
        elif (t1, t2) == (GEOM_PLANE, GEOM_CAPSULE):
            n = m1[:, :, 2]
            axis = m2[:, :, 2]
            hl = sz2[:, 1]
            r = sz2[:, 0]
            e1 = x2 + axis * hl[:, None]
            e2 = x2 - axis * hl[:, None]
            d1, p1_, _ = _plane_sphere(n, x1, e1, r)
            d2, p2_, _ = _plane_sphere(n, x1, e2, r)
            # mjc_PlaneCapsule frame: tangent1 = capsule axis projected onto
            # the plane (falls back to mju_makeFrame when near-vertical)
            proj = axis - n * jnp.einsum("ij,ij->i", n, axis)[:, None]
            pn = jnp.linalg.norm(proj, axis=1)
            t1v = proj / jnp.maximum(pn, 1e-12)[:, None]
            fallback = jax.vmap(make_frame)(n)
            frame_cap = jnp.stack([n, t1v, jnp.cross(n, t1v)], axis=1)
            frame_cap = jnp.where(
                (pn > 1e-9)[:, None, None], frame_cap, fallback
            )
            con = [(d1, p1_, n, frame_cap), (d2, p2_, n, frame_cap)]
        elif (t1, t2) == (GEOM_PLANE, GEOM_ELLIPSOID):
            n = m1[:, :, 2]
            n_local = jnp.sum(m2 * n[:, :, None], axis=1)  # R2^T n
            sn = sz2 * n_local
            s = jnp.maximum(jnp.linalg.norm(sn, axis=1), 1e-12)
            support_local = -(sz2 * sn) / s[:, None]
            sp = x2 + jnp.sum(m2 * support_local[:, None, :], axis=2)
            d_ = jnp.einsum("ij,ij->i", n, sp - x1)
            p_ = sp - 0.5 * d_[:, None] * n
            con = [(d_, p_, n)]
        elif (t1, t2) == (GEOM_PLANE, GEOM_BOX):
            n = m1[:, :, 2]
            corners = np.array(
                [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                dtype=np.float64,
            )  # (8, 3)
            corner_l = corners[None] * np.ones((npair, 1, 1))
            corner_l = jnp.asarray(corner_l, dtype=dtype) * sz2[:, None, :]
            corner_w = x2[:, None, :] + jnp.sum(
                m2[:, None, :, :] * corner_l[:, :, None, :], axis=3
            )
            hs = jnp.sum(
                n[:, None, :] * (corner_w - x1[:, None, :]), axis=2
            )  # (npair, 8)
            negd, idx = jax.lax.top_k(-hs, 4)
            d4 = -negd  # (npair, 4) smallest distances
            c4 = jnp.take_along_axis(corner_w, idx[:, :, None], axis=1)
            p4 = c4 - 0.5 * d4[:, :, None] * n[:, None, :]
            con = [(d4[:, i], p4[:, i], n) for i in range(4)]
        elif (t1, t2) == (GEOM_SPHERE, GEOM_SPHERE):
            d12 = x2 - x1
            l = jnp.maximum(jnp.linalg.norm(d12, axis=1), 1e-12)
            n = d12 / l[:, None]
            dist = l - (sz1[:, 0] + sz2[:, 0])
            pos = x1 + n * (sz1[:, 0] + 0.5 * dist)[:, None]
            con = [(dist, pos, n)]
        elif (t1, t2) == (GEOM_SPHERE, GEOM_CAPSULE):
            axis = m2[:, :, 2]
            hl = sz2[:, 1]
            t = jnp.clip(
                jnp.einsum("ij,ij->i", x1 - x2, axis), -hl, hl
            )
            cp = x2 + axis * t[:, None]
            d12 = cp - x1
            l = jnp.maximum(jnp.linalg.norm(d12, axis=1), 1e-12)
            n = d12 / l[:, None]
            dist = l - (sz1[:, 0] + sz2[:, 0])
            pos = x1 + n * (sz1[:, 0] + 0.5 * dist)[:, None]
            con = [(dist, pos, n)]
        elif (t1, t2) == (GEOM_CAPSULE, GEOM_CAPSULE):
            a_ax, b_ax = m1[:, :, 2], m2[:, :, 2]
            a_hl, b_hl = sz1[:, 1], sz2[:, 1]
            # closest points between segments (clamped; robust to parallel)
            d0 = x2 - x1
            a_dot_b = jnp.einsum("ij,ij->i", a_ax, b_ax)
            a_dot_d = jnp.einsum("ij,ij->i", a_ax, d0)
            b_dot_d = jnp.einsum("ij,ij->i", b_ax, d0)
            denom = jnp.maximum(1.0 - a_dot_b**2, 1e-9)
            ta = jnp.clip((a_dot_d - a_dot_b * b_dot_d) / denom, -a_hl, a_hl)
            tb = jnp.clip(ta * a_dot_b - b_dot_d, -b_hl, b_hl)
            ta = jnp.clip(tb * a_dot_b + a_dot_d, -a_hl, a_hl)
            pa = x1 + a_ax * ta[:, None]
            pb = x2 + b_ax * tb[:, None]
            d12 = pb - pa
            l = jnp.maximum(jnp.linalg.norm(d12, axis=1), 1e-12)
            n = d12 / l[:, None]
            dist = l - (sz1[:, 0] + sz2[:, 0])
            pos = pa + n * (sz1[:, 0] + 0.5 * dist)[:, None]
            con = [(dist, pos, n)]
        else:  # pragma: no cover - guarded in put_model
            raise NotImplementedError((t1, t2))

        for entry in con:
            if len(entry) == 4:
                d_, p_, n_, fr_ = entry
            else:
                d_, p_, n_ = entry
                fr_ = jax.vmap(make_frame)(n_)
            dists.append(d_)
            poss.append(p_)
            frames.append(fr_)
            fris.append(fri)
            refs.append(ref)
            imps.append(imp)
            margins.append(inc)

    if not dists:
        empty = Contact(
            dist=jnp.zeros(0, dtype),
            pos=jnp.zeros((0, 3), dtype),
            frame=jnp.zeros((0, 3, 3), dtype),
            friction=jnp.zeros((0, 5), dtype),
            solref=jnp.zeros((0, 2), dtype),
            solimp=jnp.zeros((0, 5), dtype),
            includemargin=jnp.zeros(0, dtype),
        )
        return data, empty

    contact = Contact(
        dist=jnp.concatenate(dists),
        pos=jnp.concatenate(poss),
        frame=jnp.concatenate(frames),
        friction=jnp.concatenate(fris),
        solref=jnp.concatenate(refs),
        solimp=jnp.concatenate(imps),
        includemargin=jnp.concatenate(margins),
    )
    data = data.replace(
        contact_dist=contact.dist,
        contact_pos=contact.pos,
        contact_frame=contact.frame,
    )
    return data, contact


def contact_bodies(plan: PhysicsPlan) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Static (geom1, geom2, body1, body2) per contact slot, matching the
    emission order of `collide`."""
    # collide() emits, per group, contact-slot 0 of every pair, then slot 1 of
    # every pair, etc. Reproduce that order here.
    g1_out, g2_out = [], []
    for t1, t2, g1, g2 in plan.pair_groups:
        ncon_per = plan.ncon_per_pair_type[(t1, t2)]
        for k in range(ncon_per):
            g1_out.append(g1)
            g2_out.append(g2)
    geom1 = np.concatenate(g1_out) if g1_out else np.zeros(0, np.int64)
    geom2 = np.concatenate(g2_out) if g2_out else np.zeros(0, np.int64)
    body1 = plan.geom_bodyid[geom1] if len(geom1) else geom1
    body2 = plan.geom_bodyid[geom2] if len(geom2) else geom2
    return geom1, geom2, body1, body2
