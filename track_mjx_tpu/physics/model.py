"""Host-side model compiler: mujoco.MjModel -> (PhysicsPlan, Model) + Data.

This is the framework's "graph builder". The MuJoCo C library is used ONLY on
the host to parse/compile MJCF into an MjModel; everything the device touches
is re-packed here into:

- ``PhysicsPlan``: static structure (tree topology, per-level gather indices,
  dof ancestry masks, collision candidate pairs, transmission layouts). It is
  compiled INTO the XLA program as constants — Python-level control flow over
  it is resolved at trace time, so there are no dynamic shapes on device.
- ``Model``: numeric parameters as a JAX pytree (masses, inertias, gears,
  ranges, solref/solimp, options). Batched/replaced leaves give domain
  randomization for free.
- ``Data``: the per-env dynamic state pytree (qpos/qvel/act + derived stages).

Reference parity: the reference reaches this functionality through
`mjx.put_model` / `mjx.make_data` (track_mjx/environment/task/
single_clip_tracking.py:91, SURVEY.md section 2b). The packing here is a fresh
TPU-first design: dense ancestry-masked mass matrices, constant (nu,nq)/(nu,nv)
transmission matrices, and a static collision pair table so every step has
fixed shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
from flax import struct

# MuJoCo enum values (stable ABI, asserted at pack time).
JNT_FREE, JNT_BALL, JNT_SLIDE, JNT_HINGE = 0, 1, 2, 3
GEOM_PLANE, GEOM_HFIELD, GEOM_SPHERE, GEOM_CAPSULE = 0, 1, 2, 3
GEOM_ELLIPSOID, GEOM_CYLINDER, GEOM_BOX, GEOM_MESH = 4, 5, 6, 7
TRN_JOINT, TRN_TENDON = 0, 3
DYN_NONE, DYN_INTEGRATOR, DYN_FILTER, DYN_FILTEREXACT = 0, 1, 2, 3
GAIN_FIXED, GAIN_AFFINE, GAIN_MUSCLE = 0, 1, 2
BIAS_NONE, BIAS_AFFINE, BIAS_MUSCLE = 0, 1, 2
SOLVER_PGS, SOLVER_CG, SOLVER_NEWTON = 0, 1, 2
INT_EULER, INT_RK4, INT_IMPLICIT, INT_IMPLICITFAST = 0, 1, 2, 3
CONE_PYRAMIDAL, CONE_ELLIPTIC = 0, 1
EQ_CONNECT, EQ_WELD, EQ_JOINT, EQ_TENDON = 0, 1, 2, 3
OBJ_BODY, OBJ_SITE = 1, 6  # mjOBJ_BODY / mjOBJ_SITE (connect/weld anchoring)


@dataclasses.dataclass(frozen=True, eq=False)
class PhysicsPlan:
    """Static physics structure. Hash/eq by identity: one plan per model build,
    so jit caches per plan instance (standard closure-capture pattern)."""

    nq: int
    nv: int
    nu: int
    na: int
    nbody: int
    njnt: int
    ngeom: int
    nsite: int
    ntendon: int
    nsensor: int
    nsensordata: int
    ncon: int  # static candidate contact count
    nefc: int  # static constraint row count (eq + friction + limits + contacts)
    ne: int  # equality rows (FIRST ne efc rows, C row order)
    nf: int  # dof/tendon frictionloss rows (next nf efc rows)
    nlimit: int
    ncon_ell: int  # elliptic cone blocks (last 3*ncon_ell efc rows); 0 if pyramidal
    # equality constraints (static structure; mj_instantiateEquality parity).
    # Each entry: (eq_id, obj1, obj2). Only eq_active0 constraints are packed —
    # runtime eq_active toggling is not supported (loudly documented).
    eq_connect: tuple  # ((eq_id, obj1, obj2, is_site), ...)
    eq_weld: tuple  # ((eq_id, obj1, obj2, is_site), ...)
    eq_joint: tuple  # ((eq_id, jnt1, jnt2), ...); jnt2 = -1 for constant
    eq_tendon: tuple  # ((eq_id, ten1, ten2), ...); ten2 = -1 for constant
    friction_dof_ids: np.ndarray  # dofs with frictionloss > 0
    friction_tendon_ids: np.ndarray  # fixed tendons with frictionloss > 0

    # topology (numpy, trace-time constants)
    body_parentid: np.ndarray
    body_rootid: np.ndarray
    body_jntadr: np.ndarray
    body_jntnum: np.ndarray
    body_dofadr: np.ndarray
    body_dofnum: np.ndarray
    body_geomadr: np.ndarray
    body_geomnum: np.ndarray
    body_levels: tuple  # tuple of np arrays: body ids per tree depth (root excl.)
    jnt_type: np.ndarray
    jnt_qposadr: np.ndarray
    jnt_dofadr: np.ndarray
    jnt_bodyid: np.ndarray
    jnt_limited: np.ndarray
    limited_jnt_ids: np.ndarray  # hinge/slide joints with limits
    dof_bodyid: np.ndarray
    dof_jntid: np.ndarray
    dof_parentid: np.ndarray
    ancestry_mask: np.ndarray  # (nv, nv) bool: j ancestor-or-self of i
    geom_bodyid: np.ndarray
    geom_type: np.ndarray
    site_bodyid: np.ndarray
    # collision candidate pairs, grouped by (type1, type2)
    pair_groups: tuple  # tuple of (t1, t2, np.ndarray geom1, np.ndarray geom2)
    ncon_per_pair_type: dict  # {(t1,t2): contacts emitted per pair}
    condim: int  # max contact dim over all candidate contacts
    contact_condim: np.ndarray  # (ncon,) per-contact-slot condim
    # actuators
    actuator_trntype: np.ndarray
    actuator_dyntype: np.ndarray
    actuator_gaintype: np.ndarray
    actuator_biastype: np.ndarray
    # sensors
    sensor_type: np.ndarray
    sensor_objtype: np.ndarray
    sensor_objid: np.ndarray
    sensor_adr: np.ndarray
    sensor_dim: np.ndarray
    # options (static: control flow / sizes)
    integrator: int
    solver: int
    cone: int
    iterations: int
    ls_iterations: int
    disableflags: int
    fluid_active: bool  # density/viscosity/wind nonzero -> inertia-box model
    tendon_passive_active: bool  # any tendon stiffness/damping nonzero

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


@struct.dataclass
class Model:
    """Numeric model parameters (JAX pytree). Leaves may be batched for
    domain randomization."""

    opt_timestep: jax.Array
    opt_gravity: jax.Array
    opt_tolerance: jax.Array
    opt_ls_tolerance: jax.Array
    opt_impratio: jax.Array
    opt_density: jax.Array
    opt_viscosity: jax.Array
    opt_wind: jax.Array
    qpos0: jax.Array
    qpos_spring: jax.Array
    body_pos: jax.Array
    body_quat: jax.Array
    body_ipos: jax.Array
    body_iquat: jax.Array
    body_mass: jax.Array
    body_inertia: jax.Array
    body_subtreemass: jax.Array
    body_invweight0: jax.Array
    jnt_pos: jax.Array
    jnt_axis: jax.Array
    jnt_range: jax.Array
    jnt_stiffness: jax.Array
    jnt_solref: jax.Array
    jnt_solimp: jax.Array
    jnt_margin: jax.Array
    dof_damping: jax.Array
    dof_armature: jax.Array
    dof_invweight0: jax.Array
    dof_frictionloss: jax.Array
    dof_solref_fri: jax.Array  # (nv, 2) friction-row solref (mjModel.dof_solref)
    dof_solimp_fri: jax.Array  # (nv, 5) friction-row solimp (mjModel.dof_solimp)
    # equality constraints (neq_active rows of each; packed in plan order)
    eq_data: jax.Array  # (neq, 11)
    eq_solref: jax.Array  # (neq, 2)
    eq_solimp: jax.Array  # (neq, 5)
    geom_pos: jax.Array
    geom_quat: jax.Array
    geom_size: jax.Array
    geom_friction: jax.Array
    geom_solref: jax.Array
    geom_solimp: jax.Array
    geom_solmix: jax.Array
    geom_margin: jax.Array
    geom_gap: jax.Array
    geom_priority: jax.Array
    site_pos: jax.Array
    site_quat: jax.Array
    # tendons: fixed (joint-coupled) only -> constant jacobian
    tendon_moment: jax.Array  # (ntendon, nv)
    tendon_length_mat: jax.Array  # (ntendon, nq) for hinge/slide coupling
    tendon_length0_const: jax.Array  # (ntendon,) constant offset
    tendon_length0: jax.Array  # (ntendon,) length at qpos0 (eq-residual ref)
    tendon_invweight0: jax.Array  # (ntendon,)
    tendon_frictionloss: jax.Array  # (ntendon,)
    tendon_solref_fri: jax.Array  # (ntendon, 2)
    tendon_solimp_fri: jax.Array  # (ntendon, 5)
    tendon_stiffness: jax.Array  # (ntendon,)
    tendon_damping: jax.Array  # (ntendon,)
    tendon_lengthspring: jax.Array  # (ntendon, 2) deadband [lower, upper]
    # actuators
    actuator_gear0: jax.Array  # (nu,)
    actuator_len_mat: jax.Array  # (nu, nq): length = len_mat @ qpos + len_const
    actuator_len_const: jax.Array  # (nu,)
    actuator_moment: jax.Array  # (nu, nv): constant transmission moment
    actuator_dynprm: jax.Array  # (nu, 10)
    actuator_gainprm: jax.Array
    actuator_biasprm: jax.Array
    actuator_ctrlrange: jax.Array
    actuator_forcerange: jax.Array
    actuator_actrange: jax.Array
    actuator_ctrllimited: jax.Array
    actuator_forcelimited: jax.Array
    actuator_actlimited: jax.Array
    actuator_acc0: jax.Array


@struct.dataclass
class Data:
    """Per-env dynamic state + derived stage outputs (single env; vmap over a
    leading batch axis for vectorization)."""

    time: jax.Array
    qpos: jax.Array
    qvel: jax.Array
    act: jax.Array
    ctrl: jax.Array
    qacc: jax.Array
    qacc_smooth: jax.Array
    qacc_warmstart: jax.Array
    # kinematics
    xpos: jax.Array
    xquat: jax.Array
    xmat: jax.Array
    xipos: jax.Array
    ximat: jax.Array
    xanchor: jax.Array
    xaxis: jax.Array
    geom_xpos: jax.Array
    geom_xmat: jax.Array
    site_xpos: jax.Array
    site_xmat: jax.Array
    # com-based quantities
    subtree_com: jax.Array
    cinert: jax.Array
    cdof: jax.Array
    cvel: jax.Array
    cdof_dot: jax.Array
    # inertia
    qM: jax.Array
    qLD: jax.Array  # dense cholesky factor (lower)
    crb_buf: jax.Array  # (nv, 6) composite-inertia * cdof (qM = buf @ cdof^T)
    # forces
    qfrc_bias: jax.Array
    qfrc_passive: jax.Array
    qfrc_spring: jax.Array
    qfrc_damper: jax.Array
    qfrc_actuator: jax.Array
    qfrc_smooth: jax.Array
    qfrc_constraint: jax.Array
    # Euler implicit-damping solve (M + h diag(damping))^-1 (qfrc_smooth +
    # qfrc_constraint), produced by the fused CG kernel when the plan
    # integrates with Euler (solver.fused_euler) so the integrator needs no
    # second factorization dispatch; zeros otherwise.
    qacc_eff: jax.Array
    # actuation
    act_dot: jax.Array
    actuator_length: jax.Array
    actuator_velocity: jax.Array
    actuator_force: jax.Array
    ten_length: jax.Array
    ten_velocity: jax.Array
    # constraints (static shapes)
    contact_dist: jax.Array  # (ncon,)
    contact_pos: jax.Array  # (ncon, 3)
    contact_frame: jax.Array  # (ncon, 3, 3) rows = normal, tan1, tan2
    efc_force: jax.Array  # (nefc,)
    # sensors
    sensordata: jax.Array


def _body_levels(parentid: np.ndarray) -> tuple:
    depth = np.zeros(len(parentid), dtype=np.int64)
    for b in range(1, len(parentid)):
        depth[b] = depth[parentid[b]] + 1
    levels = []
    for d in range(1, int(depth.max()) + 1 if len(parentid) > 1 else 1):
        ids = np.nonzero(depth == d)[0]
        if len(ids):
            levels.append(ids)
    return tuple(levels)


def _ancestry_mask(dof_parentid: np.ndarray) -> np.ndarray:
    nv = len(dof_parentid)
    mask = np.zeros((nv, nv), dtype=bool)
    for i in range(nv):
        j = i
        while j >= 0:
            mask[i, j] = True
            j = int(dof_parentid[j])
    return mask


def _collision_pairs(m: mujoco.MjModel):
    """Static candidate geom pairs after contype/conaffinity, same-body/weld,
    parent-child and explicit-exclude filtering (mirrors mj_collision's
    broadphase filters; reference consumes this via mjx)."""
    exclude = set()
    for e in range(m.nexclude):
        sig = int(m.exclude_signature[e])
        b1, b2 = sig >> 16, sig & 0xFFFF
        exclude.add((min(b1, b2), max(b1, b2)))
    pairs = []
    for i in range(m.ngeom):
        for j in range(i + 1, m.ngeom):
            b1, b2 = int(m.geom_bodyid[i]), int(m.geom_bodyid[j])
            w1, w2 = int(m.body_weldid[b1]), int(m.body_weldid[b2])
            if w1 == w2:
                continue
            # parent-child filter (world-parented bodies exempt)
            pw1 = int(m.body_weldid[m.body_parentid[w1]])
            pw2 = int(m.body_weldid[m.body_parentid[w2]])
            if (w1 == pw2 or w2 == pw1) and not (w1 == 0 or w2 == 0):
                continue
            if not (
                (m.geom_contype[i] & m.geom_conaffinity[j])
                or (m.geom_contype[j] & m.geom_conaffinity[i])
            ):
                continue
            if (min(b1, b2), max(b1, b2)) in exclude:
                continue
            t1, t2 = int(m.geom_type[i]), int(m.geom_type[j])
            g1, g2 = i, j
            if t1 > t2:  # canonical order: lower type code first
                t1, t2, g1, g2 = t2, t1, g2, g1
            pairs.append((t1, t2, g1, g2))

    groups: dict = {}
    for t1, t2, g1, g2 in pairs:
        groups.setdefault((t1, t2), []).append((g1, g2))
    out = []
    for (t1, t2), gs in sorted(groups.items()):
        g1 = np.array([g[0] for g in gs], dtype=np.int64)
        g2 = np.array([g[1] for g in gs], dtype=np.int64)
        out.append((t1, t2, g1, g2))
    return tuple(out)


# contacts emitted per candidate pair by our narrowphase
_NCON_PER_TYPE = {
    (GEOM_PLANE, GEOM_SPHERE): 1,
    (GEOM_PLANE, GEOM_CAPSULE): 2,
    (GEOM_PLANE, GEOM_ELLIPSOID): 1,
    (GEOM_PLANE, GEOM_BOX): 4,
    (GEOM_SPHERE, GEOM_SPHERE): 1,
    (GEOM_SPHERE, GEOM_CAPSULE): 1,
    (GEOM_CAPSULE, GEOM_CAPSULE): 1,
}


def _fixed_tendon_matrices(m: mujoco.MjModel):
    """Builds constant (ntendon, nv) moment and (ntendon, nq) length matrices
    for fixed (joint-coupled) tendons. Spatial tendons are not supported."""
    nt = m.ntendon
    moment = np.zeros((nt, m.nv))
    length_mat = np.zeros((nt, m.nq))
    length_const = np.zeros((nt,))
    for t in range(nt):
        adr, num = int(m.tendon_adr[t]), int(m.tendon_num[t])
        for w in range(adr, adr + num):
            if int(m.wrap_type[w]) != 1:  # mjWRAP_JOINT
                raise NotImplementedError("only fixed (joint) tendons supported")
            j = int(m.wrap_objid[w])
            coef = float(m.wrap_prm[w])
            jt = int(m.jnt_type[j])
            if jt not in (JNT_SLIDE, JNT_HINGE):
                raise NotImplementedError("fixed tendon on non-scalar joint")
            moment[t, int(m.jnt_dofadr[j])] += coef
            length_mat[t, int(m.jnt_qposadr[j])] += coef
    return moment, length_mat, length_const


def _transmission_matrices(m: mujoco.MjModel, tendon_moment, tendon_len_mat):
    """Constant actuator transmission: length = len_mat @ qpos + len_const,
    moment (nu, nv). Valid because rodent/fly actuators drive scalar joints or
    fixed tendons only (reference rodent.xml actuator block)."""
    nu = m.nu
    len_mat = np.zeros((nu, m.nq))
    len_const = np.zeros((nu,))
    moment = np.zeros((nu, m.nv))
    gear0 = m.actuator_gear[:, 0].copy()
    for u in range(nu):
        trn = int(m.actuator_trntype[u])
        tid = int(m.actuator_trnid[u, 0])
        g = float(gear0[u])
        if trn == TRN_JOINT:
            jt = int(m.jnt_type[tid])
            if jt not in (JNT_SLIDE, JNT_HINGE):
                raise NotImplementedError("joint transmission on non-scalar joint")
            len_mat[u, int(m.jnt_qposadr[tid])] = g
            moment[u, int(m.jnt_dofadr[tid])] = g
        elif trn == TRN_TENDON:
            len_mat[u] = g * tendon_len_mat[tid]
            moment[u] = g * tendon_moment[tid]
        else:
            raise NotImplementedError(f"actuator trntype {trn}")
    return len_mat, len_const, moment, gear0


def put_model(m: mujoco.MjModel, dtype=jnp.float32) -> tuple[PhysicsPlan, Model]:
    """Packs a compiled MjModel into (PhysicsPlan, Model) device structures."""
    if m.nflex:
        raise NotImplementedError("flex not supported")
    eq_connect, eq_weld, eq_joint, eq_tendon = [], [], [], []
    for e in range(m.neq):
        if not m.eq_active0[e]:
            continue  # statically inactive; runtime eq_active flips unsupported
        ty = int(m.eq_type[e])
        o1, o2 = int(m.eq_obj1id[e]), int(m.eq_obj2id[e])
        if ty in (EQ_CONNECT, EQ_WELD):
            objtype = int(m.eq_objtype[e])
            if objtype not in (OBJ_BODY, OBJ_SITE):
                raise NotImplementedError(
                    f"connect/weld equality objtype {objtype} not supported"
                )
            (eq_connect if ty == EQ_CONNECT else eq_weld).append(
                (e, o1, o2, objtype == OBJ_SITE)
            )
        elif ty == EQ_JOINT:
            if m.jnt_type[o1] not in (JNT_HINGE, JNT_SLIDE) or (
                o2 >= 0 and m.jnt_type[o2] not in (JNT_HINGE, JNT_SLIDE)
            ):
                raise NotImplementedError("joint equality on non-scalar joint")
            eq_joint.append((e, o1, o2))
        elif ty == EQ_TENDON:
            eq_tendon.append((e, o1, o2))
        else:
            raise NotImplementedError(f"equality type {ty} not supported")
    ne = 3 * len(eq_connect) + 6 * len(eq_weld) + len(eq_joint) + len(eq_tendon)
    friction_dof = np.nonzero(m.dof_frictionloss > 0)[0]
    friction_ten = np.nonzero(m.tendon_frictionloss > 0)[0] if m.ntendon else (
        np.zeros(0, np.int64)
    )
    nf = len(friction_dof) + len(friction_ten)
    condims = set(int(c) for c in m.geom_condim)
    if condims - {1, 3, 4, 6}:
        raise NotImplementedError(
            f"condim {condims} not supported (need 1, 3, 4, or 6)"
        )
    if int(m.opt.cone) == CONE_ELLIPTIC and condims - {1, 3}:
        raise NotImplementedError(
            "elliptic cone with condim > 3 (torsional/rolling friction) not "
            "supported; pyramidal supports condim 4/6"
        )
    if np.abs(m.geom_fluid).any():
        raise NotImplementedError(
            "per-geom ellipsoid fluid model (fluidshape) not supported; only "
            "the inertia-box model (opt.density/viscosity) is implemented"
        )

    pair_groups = _collision_pairs(m)
    ncon = 0
    contact_condim = []
    for t1, t2, g1, g2 in pair_groups:
        if (t1, t2) not in _NCON_PER_TYPE:
            raise NotImplementedError(f"collision pair type {(t1, t2)}")
        ncon_per = _NCON_PER_TYPE[(t1, t2)]
        ncon += ncon_per * len(g1)
        # contact condim = max of the two geoms' condim (mj_contactParam
        # equal-priority rule; priority overrides are rare and unused here)
        cd = np.maximum(m.geom_condim[g1], m.geom_condim[g2])
        for _ in range(ncon_per):
            contact_condim.append(cd)
    contact_condim = (
        np.concatenate(contact_condim) if contact_condim else np.zeros(0, np.int64)
    )
    condim = int(contact_condim.max()) if ncon else 1

    limited_jnt = np.nonzero(
        (m.jnt_limited == 1)
        & ((m.jnt_type == JNT_HINGE) | (m.jnt_type == JNT_SLIDE))
    )[0]
    nlimit = len(limited_jnt)
    # efc rows in C order: equality + frictionloss + limits + per-contact
    # friction rows (pyramidal: 2*(condim-1) unilateral rows; elliptic:
    # condim rows forming one cone)
    if int(m.opt.cone) == CONE_ELLIPTIC:
        rows_per_con = np.where(contact_condim == 1, 1, contact_condim)
    else:
        rows_per_con = np.where(contact_condim == 1, 1, 2 * (contact_condim - 1))
    nefc = ne + nf + nlimit + int(rows_per_con.sum())

    tendon_moment, tendon_len_mat, tendon_len_const = _fixed_tendon_matrices(m)
    act_len_mat, act_len_const, act_moment, gear0 = _transmission_matrices(
        m, tendon_moment, tendon_len_mat
    )

    plan = PhysicsPlan(
        nq=m.nq,
        nv=m.nv,
        nu=m.nu,
        na=m.na,
        nbody=m.nbody,
        njnt=m.njnt,
        ngeom=m.ngeom,
        nsite=m.nsite,
        ntendon=m.ntendon,
        nsensor=m.nsensor,
        nsensordata=m.nsensordata,
        ncon=ncon,
        nefc=nefc,
        ne=ne,
        nf=nf,
        nlimit=nlimit,
        eq_connect=tuple(eq_connect),
        eq_weld=tuple(eq_weld),
        eq_joint=tuple(eq_joint),
        eq_tendon=tuple(eq_tendon),
        friction_dof_ids=friction_dof,
        friction_tendon_ids=friction_ten,
        ncon_ell=(
            int((contact_condim >= 3).sum())
            if int(m.opt.cone) == CONE_ELLIPTIC
            else 0
        ),
        body_parentid=m.body_parentid.copy(),
        body_rootid=m.body_rootid.copy(),
        body_jntadr=m.body_jntadr.copy(),
        body_jntnum=m.body_jntnum.copy(),
        body_dofadr=m.body_dofadr.copy(),
        body_dofnum=m.body_dofnum.copy(),
        body_geomadr=m.body_geomadr.copy(),
        body_geomnum=m.body_geomnum.copy(),
        body_levels=_body_levels(m.body_parentid),
        jnt_type=m.jnt_type.copy(),
        jnt_qposadr=m.jnt_qposadr.copy(),
        jnt_dofadr=m.jnt_dofadr.copy(),
        jnt_bodyid=m.jnt_bodyid.copy(),
        jnt_limited=m.jnt_limited.copy(),
        limited_jnt_ids=limited_jnt,
        dof_bodyid=m.dof_bodyid.copy(),
        dof_jntid=m.dof_jntid.copy(),
        dof_parentid=m.dof_parentid.copy(),
        ancestry_mask=_ancestry_mask(m.dof_parentid),
        geom_bodyid=m.geom_bodyid.copy(),
        geom_type=m.geom_type.copy(),
        site_bodyid=m.site_bodyid.copy(),
        pair_groups=pair_groups,
        ncon_per_pair_type=dict(_NCON_PER_TYPE),
        condim=condim,
        contact_condim=contact_condim,
        actuator_trntype=m.actuator_trntype.copy(),
        actuator_dyntype=m.actuator_dyntype.copy(),
        actuator_gaintype=m.actuator_gaintype.copy(),
        actuator_biastype=m.actuator_biastype.copy(),
        sensor_type=m.sensor_type.copy(),
        sensor_objtype=m.sensor_objtype.copy(),
        sensor_objid=m.sensor_objid.copy(),
        sensor_adr=m.sensor_adr.copy(),
        sensor_dim=m.sensor_dim.copy(),
        integrator=int(m.opt.integrator),
        solver=int(m.opt.solver),
        cone=int(m.opt.cone),
        iterations=int(m.opt.iterations),
        ls_iterations=int(m.opt.ls_iterations),
        disableflags=int(m.opt.disableflags),
        fluid_active=bool(
            m.opt.density > 0
            or m.opt.viscosity > 0
            or np.abs(m.opt.wind).any()
        ),
        tendon_passive_active=bool(
            m.ntendon
            and ((m.tendon_stiffness != 0).any() or (m.tendon_damping != 0).any())
        ),
    )

    a = lambda x: jnp.asarray(x, dtype=dtype)
    model = Model(
        opt_timestep=a(m.opt.timestep),
        opt_gravity=a(m.opt.gravity),
        opt_tolerance=a(m.opt.tolerance),
        opt_ls_tolerance=a(m.opt.ls_tolerance),
        opt_impratio=a(m.opt.impratio),
        opt_density=a(m.opt.density),
        opt_viscosity=a(m.opt.viscosity),
        opt_wind=a(m.opt.wind),
        qpos0=a(m.qpos0),
        qpos_spring=a(m.qpos_spring),
        body_pos=a(m.body_pos),
        body_quat=a(m.body_quat),
        body_ipos=a(m.body_ipos),
        body_iquat=a(m.body_iquat),
        body_mass=a(m.body_mass),
        body_inertia=a(m.body_inertia),
        body_subtreemass=a(m.body_subtreemass),
        body_invweight0=a(m.body_invweight0),
        jnt_pos=a(m.jnt_pos),
        jnt_axis=a(m.jnt_axis),
        jnt_range=a(m.jnt_range),
        jnt_stiffness=a(m.jnt_stiffness),
        jnt_solref=a(m.jnt_solref),
        jnt_solimp=a(m.jnt_solimp),
        jnt_margin=a(m.jnt_margin),
        dof_damping=a(m.dof_damping),
        dof_armature=a(m.dof_armature),
        dof_invweight0=a(m.dof_invweight0),
        dof_frictionloss=a(m.dof_frictionloss),
        dof_solref_fri=a(m.dof_solref),
        dof_solimp_fri=a(m.dof_solimp),
        eq_data=a(m.eq_data),
        eq_solref=a(m.eq_solref),
        eq_solimp=a(m.eq_solimp),
        geom_pos=a(m.geom_pos),
        geom_quat=a(m.geom_quat),
        geom_size=a(m.geom_size),
        geom_friction=a(m.geom_friction),
        geom_solref=a(m.geom_solref),
        geom_solimp=a(m.geom_solimp),
        geom_solmix=a(m.geom_solmix),
        geom_margin=a(m.geom_margin),
        geom_gap=a(m.geom_gap),
        geom_priority=a(m.geom_priority),
        site_pos=a(m.site_pos),
        site_quat=a(m.site_quat),
        tendon_moment=a(tendon_moment),
        tendon_length_mat=a(tendon_len_mat),
        tendon_length0_const=a(tendon_len_const),
        tendon_length0=a(m.tendon_length0),
        tendon_invweight0=a(m.tendon_invweight0),
        tendon_frictionloss=a(m.tendon_frictionloss),
        tendon_solref_fri=a(m.tendon_solref_fri),
        tendon_solimp_fri=a(m.tendon_solimp_fri),
        tendon_stiffness=a(m.tendon_stiffness),
        tendon_damping=a(m.tendon_damping),
        tendon_lengthspring=a(
            m.tendon_lengthspring.reshape(m.ntendon, 2)
            if m.ntendon
            else np.zeros((0, 2))
        ),
        actuator_gear0=a(gear0),
        actuator_len_mat=a(act_len_mat),
        actuator_len_const=a(act_len_const),
        actuator_moment=a(act_moment),
        actuator_dynprm=a(m.actuator_dynprm),
        actuator_gainprm=a(m.actuator_gainprm),
        actuator_biasprm=a(m.actuator_biasprm),
        actuator_ctrlrange=a(m.actuator_ctrlrange),
        actuator_forcerange=a(m.actuator_forcerange),
        actuator_actrange=a(m.actuator_actrange),
        actuator_ctrllimited=a(m.actuator_ctrllimited),
        actuator_forcelimited=a(m.actuator_forcelimited),
        actuator_actlimited=a(m.actuator_actlimited),
        actuator_acc0=a(m.actuator_acc0),
    )
    return plan, model


def make_data(plan: PhysicsPlan, model: Model) -> Data:
    """Zero-initialized Data at qpos0 (mirrors mj_makeData defaults)."""
    dtype = model.qpos0.dtype
    z = lambda *shape: jnp.zeros(shape, dtype=dtype)
    nbody, nv, nq = plan.nbody, plan.nv, plan.nq
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (nbody, 3, 3))
    unit_quat = jnp.tile(
        jnp.array([1.0, 0, 0, 0], dtype=dtype), (nbody, 1)
    )
    return Data(
        time=jnp.zeros((), dtype=dtype),
        qpos=model.qpos0,
        qvel=z(nv),
        act=z(plan.na),
        ctrl=z(plan.nu),
        qacc=z(nv),
        qacc_smooth=z(nv),
        qacc_warmstart=z(nv),
        xpos=z(nbody, 3),
        xquat=unit_quat,
        xmat=eye3,
        xipos=z(nbody, 3),
        ximat=eye3,
        xanchor=z(plan.njnt, 3),
        xaxis=z(plan.njnt, 3),
        geom_xpos=z(plan.ngeom, 3),
        geom_xmat=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (plan.ngeom, 3, 3)),
        site_xpos=z(plan.nsite, 3),
        site_xmat=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (plan.nsite, 3, 3)),
        subtree_com=z(nbody, 3),
        cinert=z(nbody, 10),
        cdof=z(nv, 6),
        cvel=z(nbody, 6),
        cdof_dot=z(nv, 6),
        qM=z(nv, nv),
        qLD=z(nv, nv),
        crb_buf=z(nv, 6),
        qfrc_bias=z(nv),
        qfrc_passive=z(nv),
        qfrc_spring=z(nv),
        qfrc_damper=z(nv),
        qfrc_actuator=z(nv),
        qacc_eff=z(nv),
        qfrc_smooth=z(nv),
        qfrc_constraint=z(nv),
        act_dot=z(plan.na),
        actuator_length=z(plan.nu),
        actuator_velocity=z(plan.nu),
        actuator_force=z(plan.nu),
        ten_length=z(plan.ntendon),
        ten_velocity=z(plan.ntendon),
        contact_dist=z(plan.ncon),
        contact_pos=z(plan.ncon, 3),
        contact_frame=jnp.broadcast_to(
            jnp.eye(3, dtype=dtype), (plan.ncon, 3, 3)
        ),
        efc_force=z(plan.nefc),
        sensordata=z(plan.nsensordata),
    )
