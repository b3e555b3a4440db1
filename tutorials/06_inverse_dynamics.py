"""Tutorial 6 — Inverse dynamics.

Role parity: /root/reference/tutorials/6_Inverse_Dynamics.ipynb (compute
the generalized forces that realize a desired acceleration). With the
physics pipeline exposed as pure functions this is three lines:
tau = M(q) @ qacc_des + bias(q, qdot) - passive(q, qdot), using the same
CRB mass matrix and RNE bias the forward step uses.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

import myosuite_tpu
from myosuite_tpu.physics import forward as fwd

SMOKE = os.environ.get("MTX_TUTORIAL_SMOKE") == "1"

env = myosuite_tpu.make("MtxElbowPoseFixed-v0")
m = env.model


def inverse_dynamics(data, qacc_des):
    """Generalized force needed for qacc_des at data's (qpos, qvel)."""
    d = fwd.fwd_position(m, data)
    d = fwd.fwd_velocity(m, d)
    d = fwd.fwd_actuation(m, d)
    d = fwd.fwd_acceleration(m, d)
    # subtract what muscles already exert (passive FLV force at act=0)
    return (d.qM @ qacc_des + d.qfrc_bias - d.qfrc_passive
            - d.qfrc_actuator)


state = jax.jit(env.reset)(jax.random.PRNGKey(0))

# desired: hold still (qacc = 0) -> gravity-compensation torques
tau_hold = jax.jit(inverse_dynamics)(state.data, jnp.zeros(m.nv))
print("gravity-compensation torque [Nm]:", np.round(np.asarray(tau_hold), 4))

# verify: applying tau as qfrc_applied yields ~the desired acceleration
qacc_des = jnp.array([0.5] * m.nv)
tau = jax.jit(inverse_dynamics)(state.data, qacc_des)

d = state.data.replace(qfrc_applied=tau, ctrl=jnp.zeros(m.nu))
d = jax.jit(lambda d: fwd.forward(m, d))(d)
err = np.abs(np.asarray(d.qacc) - np.asarray(qacc_des)).max()
print(f"achieved qacc {np.round(np.asarray(d.qacc), 3)} "
      f"(target {np.asarray(qacc_des)}), max err {err:.2e}")
assert err < 5e-2, "inverse dynamics should reproduce the target accel"
