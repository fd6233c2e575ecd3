"""Equality-constraint and frictionloss efc-row parity vs MuJoCo C.

Covers mj_instantiateEquality (reference consumes it via mjx: SURVEY §2b
"put_model / step / forward" row; reference workloads themselves have neq=0,
so these rows exist for framework completeness): connect, weld (with
torquescale + relpose), joint (quartic polycoef coupling), tendon coupling,
and dof/tendon frictionloss rows, including the second-order -Jdot@qvel
term C folds into connect/weld aref. Each case asserts J/pos/aref/D row
parity and converged-qacc parity on a randomized state.
"""

import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from track_mjx_tpu.physics import forward as fwd
from track_mjx_tpu.physics import model as pm

_NOCON = 'contype="0" conaffinity="0"'
_OPT = 'timestep="0.002" jacobian="dense" solver="CG" iterations="50" ls_iterations="25" tolerance="0"'

CONNECT_XML = f"""
<mujoco>
  <option {_OPT}/>
  <worldbody>
    <body name="a" pos="0 0 1">
      <joint type="ball"/>
      <geom type="capsule" size="0.05" fromto="0 0 0 0.3 0 0" mass="1" {_NOCON}/>
      <body name="b" pos="0.3 0 0">
        <joint type="hinge" axis="0 1 0" range="-1 1" damping="0.1"/>
        <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0" mass="0.5" {_NOCON}/>
      </body>
    </body>
    <body name="c" pos="0.6 0 1">
      <joint type="free"/>
      <geom type="box" size="0.05 0.05 0.05" mass="0.3" {_NOCON}/>
    </body>
  </worldbody>
  <equality>
    <connect body1="b" body2="c" anchor="0.3 0 0"/>
  </equality>
</mujoco>
"""

WELD_XML = f"""
<mujoco>
  <option {_OPT}/>
  <worldbody>
    <body name="a" pos="0 0 1">
      <joint type="ball"/>
      <geom type="capsule" size="0.05" fromto="0 0 0 0.3 0 0" mass="1" {_NOCON}/>
    </body>
    <body name="c" pos="0.35 0.02 1.01" quat="0.95 0.2 0.2 0.1">
      <joint type="free"/>
      <geom type="box" size="0.05 0.05 0.05" mass="0.3" {_NOCON}/>
    </body>
  </worldbody>
  <equality>
    <weld body1="a" body2="c" anchor="0.3 0 0" torquescale="0.7"/>
  </equality>
</mujoco>
"""

JOINT_XML = f"""
<mujoco>
  <option {_OPT}/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0" mass="0.5" {_NOCON}/>
      <body pos="0.3 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0" mass="0.5" {_NOCON}/>
      </body>
    </body>
  </worldbody>
  <equality>
    <joint joint1="j2" joint2="j1" polycoef="0.1 0.5 0.2 0.1 0.05"/>
  </equality>
</mujoco>
"""

TENDON_XML = f"""
<mujoco>
  <option {_OPT}/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0" mass="0.5" {_NOCON}/>
      <body pos="0.3 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0" mass="0.5" {_NOCON}/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="t1"><joint joint="j1" coef="1.0"/><joint joint="j2" coef="-0.5"/></fixed>
    <fixed name="t2"><joint joint="j1" coef="0.3"/><joint joint="j2" coef="0.9"/></fixed>
  </tendon>
  <equality>
    <tendon tendon1="t1" tendon2="t2" polycoef="0.05 0.4 0.1 0 0"/>
  </equality>
</mujoco>
"""

FRICTION_XML = f"""
<mujoco>
  <option {_OPT}/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.1" frictionloss="0.3"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0" mass="0.5" {_NOCON}/>
      <body pos="0.3 0 0">
        <joint name="j2" type="slide" axis="1 0 0" damping="0.1" frictionloss="0.12"/>
        <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0" mass="0.5" {_NOCON}/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="t1" frictionloss="0.2"><joint joint="j1" coef="1.0"/><joint joint="j2" coef="-0.5"/></fixed>
  </tendon>
</mujoco>
"""

# joint equality declared before connect: grouped (by-type) assembly order
# differs from eq-id order; rows must come out in eq-id order like C.
MIXED_XML = f"""
<mujoco>
  <option {_OPT}/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0" mass="0.5" {_NOCON}/>
      <body name="b" pos="0.3 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0" mass="0.5" {_NOCON}/>
      </body>
    </body>
    <body name="c" pos="0.6 0 1">
      <joint type="free"/>
      <geom type="box" size="0.05 0.05 0.05" mass="0.3" {_NOCON}/>
    </body>
  </worldbody>
  <equality>
    <joint joint1="j2" joint2="j1" polycoef="0.1 0.5 0.2 0.1 0.05"/>
    <connect body1="b" body2="c" anchor="0.3 0 0"/>
  </equality>
</mujoco>
"""

SITE_CONNECT_XML = f"""
<mujoco>
  <option {_OPT}/>
  <worldbody>
    <body name="a" pos="0 0 1">
      <joint type="hinge" axis="0 1 0"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0" mass="0.5" {_NOCON}/>
      <site name="s1" pos="0.3 0 0"/>
    </body>
    <body name="c" pos="0.3 0 1">
      <joint type="free"/>
      <geom type="box" size="0.05 0.05 0.05" mass="0.3" {_NOCON}/>
      <site name="s2" pos="0 0 0"/>
    </body>
  </worldbody>
  <equality>
    <connect site1="s1" site2="s2"/>
  </equality>
</mujoco>
"""


def _c_state(xml, seed=0, qvel_scale=0.3):
    m = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)
    rng = np.random.RandomState(seed)
    d.qpos[:] = m.qpos0 + rng.uniform(-0.05, 0.05, m.nq)
    mujoco.mj_normalizeQuat(m, d.qpos)
    d.qvel[:] = rng.uniform(-qvel_scale, qvel_scale, m.nv)
    mujoco.mj_forward(m, d)
    return m, d


def _run_ours(m, d):
    plan, model = pm.put_model(m)
    data = pm.make_data(plan, model)
    data = data.replace(
        qpos=jnp.asarray(d.qpos, jnp.float32),
        qvel=jnp.asarray(d.qvel, jnp.float32),
    )
    converged = fwd.forward(plan, model, data)
    _, efc = fwd.fwd_position(plan, model, data)
    return plan, efc, converged


def _assert_rows(plan, efc, m, d, aref_rel=2e-4):
    nef = plan.ne + plan.nf
    assert (plan.ne, plan.nf) == (d.ne, d.nf)
    J_c = d.efc_J[: d.nefc * m.nv].reshape(d.nefc, m.nv)[:nef]
    for ours, c_arr, label, tol in [
        (np.asarray(efc.J)[:nef], J_c, "J", 1e-5),
        (np.asarray(efc.pos)[:nef], d.efc_pos[:nef], "pos", 1e-5),
        (np.asarray(efc.aref)[:nef], d.efc_aref[:nef], "aref", aref_rel),
        (np.asarray(efc.D)[:nef], d.efc_D[:nef], "D", 1e-5),
    ]:
        scale = max(1e-9, float(np.max(np.abs(c_arr)))) if nef else 1.0
        err = float(np.max(np.abs(ours - c_arr))) / scale if nef else 0.0
        assert err < tol, f"{label}: rel err {err:.3e} >= {tol}"


@pytest.mark.parametrize(
    "name,xml",
    [
        ("connect", CONNECT_XML),
        ("weld", WELD_XML),
        ("joint", JOINT_XML),
        ("tendon", TENDON_XML),
        ("friction", FRICTION_XML),
        ("mixed_order", MIXED_XML),
    ],
)
def test_efc_rows_and_qacc_parity(name, xml):
    m, d = _c_state(xml)
    plan, efc, converged = _run_ours(m, d)
    _assert_rows(plan, efc, m, d)
    qscale = max(1.0, float(np.max(np.abs(d.qacc))))
    qacc_err = float(np.max(np.abs(np.asarray(converged.qacc) - d.qacc)))
    assert qacc_err / qscale < 5e-3, f"qacc rel err {qacc_err / qscale:.3e}"


def test_connect_weld_aref_has_jdot_term():
    """At nontrivial qvel the -Jdot@qvel correction is well above the parity
    tolerance; this guards against regressing to the first-order formula."""
    m, d = _c_state(CONNECT_XML, qvel_scale=0.5)
    plan, efc, _ = _run_ours(m, d)
    ne = plan.ne
    # first-order formula (what C would give without the jacDot term)
    KBIP = d.efc_KBIP[:ne]
    aref_first_order = (
        -KBIP[:, 1] * d.efc_vel[:ne] - KBIP[:, 0] * KBIP[:, 2] * d.efc_pos[:ne]
    )
    gap = float(np.max(np.abs(d.efc_aref[:ne] - aref_first_order)))
    scale = float(np.max(np.abs(d.efc_aref[:ne])))
    assert gap / scale > 5e-5  # the term is material at this state
    err = float(np.max(np.abs(np.asarray(efc.aref)[:ne] - d.efc_aref[:ne])))
    assert err / scale < 2e-5  # and we reproduce it


def test_friction_force_saturates():
    """Frictionloss rows box-clamp: constraint force magnitude never exceeds
    the configured frictionloss."""
    m, d = _c_state(FRICTION_XML, qvel_scale=2.0)
    plan, efc, converged = _run_ours(m, d)
    nf = plan.nf
    floss = d.efc_frictionloss[:nf]
    ours = np.asarray(converged.efc_force)[plan.ne : plan.ne + nf]
    assert (np.abs(ours) <= floss + 1e-5).all()
    c_force = d.efc_force[plan.ne : plan.ne + nf]
    assert np.max(np.abs(ours - c_force)) / max(1.0, np.max(np.abs(c_force))) < 5e-3


SITE_WELD_XML = f"""
<mujoco>
  <option {_OPT}/>
  <worldbody>
    <body name="a" pos="0 0 1">
      <joint type="ball" damping="0.05"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0" mass="0.5" {_NOCON}/>
      <site name="s1" pos="0.3 0 0" quat="0.9 0.3 0.1 0.2"/>
    </body>
    <body name="c" pos="0.32 0.01 1.02" quat="0.95 0.2 0.2 0.1">
      <joint type="free"/>
      <geom type="box" size="0.05 0.05 0.05" mass="0.3" {_NOCON}/>
      <site name="s2" pos="0.01 0 0.02" quat="0.8 0.4 0.3 0.1"/>
    </body>
  </worldbody>
  <equality>
    <weld site1="s1" site2="s2" torquescale="0.6"/>
  </equality>
</mujoco>
"""


@pytest.mark.parametrize(
    "name,xml",
    [("site_connect", SITE_CONNECT_XML), ("site_weld", SITE_WELD_XML)],
)
def test_site_anchored_parity(name, xml):
    """Site-anchored connect/weld: anchors and (for weld) the rest rotation
    come from the site frames, eq_data is ignored (C's mjOBJ_SITE branch)."""
    m, d = _c_state(xml)
    plan, efc, converged = _run_ours(m, d)
    _assert_rows(plan, efc, m, d)
    qscale = max(1.0, float(np.max(np.abs(d.qacc))))
    qacc_err = float(np.max(np.abs(np.asarray(converged.qacc) - d.qacc)))
    assert qacc_err / qscale < 5e-3, f"qacc rel err {qacc_err / qscale:.3e}"
