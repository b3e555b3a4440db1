"""Tutorial 9 — Computed muscle control (static optimization).

Role parity: /root/reference/tutorials/9_Computed_muscle_control.ipynb
(solve for muscle activations that realize desired joint torques; the
reference uses an OSQP QP per step). Here the QP
    min_a ||J^T f(a) - tau_des||^2 + reg ||a||^2,  0 <= a <= 1
is solved with jitted projected gradient descent — MuJoCo muscle force is
affine in activation (force = gain(l, v) * a + bias(l)), so the problem
is a box-constrained least squares, and the whole solve vmaps over a
trajectory of setpoints.
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
state = jax.jit(env.reset)(jax.random.PRNGKey(0))

# physics quantities at the current posture
d = fwd.fwd_position(m, state.data)
d = fwd.fwd_velocity(m, d)
d = fwd.fwd_actuation(m, d)
moment = d.actuator_moment                   # (nu, nv): dtau/dforce

# muscle force is affine in activation: f = G * a + B
# extract G and B by evaluating the actuation stage at a=0 and a=1
def muscle_force(act):
    da = d.replace(act=act)
    da = fwd.fwd_actuation(m, da)
    return da.actuator_force

f0 = muscle_force(jnp.zeros(m.nu))           # bias B (passive FLV force)
f1 = muscle_force(jnp.ones(m.nu))
G = f1 - f0                                  # gain per unit activation


def computed_muscle_control(tau_des, reg=1e-4, iters=200, lr=None):
    """Projected gradient for min ||M^T (G a + B) - tau||^2 + reg||a||^2."""
    A = moment.T * G[None, :]                # (nv, nu) torque per activation
    b = tau_des - moment.T @ f0
    if lr is None:
        lr = 1.0 / (jnp.linalg.norm(A, 2) ** 2 + reg)

    def body(a, _):
        grad = A.T @ (A @ a - b) + reg * a
        return jnp.clip(a - lr * grad, 0.0, 1.0), None

    a, _ = jax.lax.scan(body, jnp.full((m.nu,), 0.5), None, length=iters)
    return a, jnp.linalg.norm(A @ a - b)


# desired: gravity compensation torque at this posture
dd = fwd.fwd_acceleration(m, d)
tau_des = dd.qfrc_bias - dd.qfrc_passive
a_star, residual = jax.jit(computed_muscle_control)(tau_des)
print("activations:", np.round(np.asarray(a_star), 3))
print("torque residual:", float(residual))

# verify in simulation: hold the posture with the computed activations
hold = jax.jit(env.step_ctrl)
s = state
q0 = np.asarray(state.data.qpos)
for _ in range(5 if SMOKE else 50):
    s = hold(s, a_star)
drift = np.abs(np.asarray(s.data.qpos) - q0).max()
print(f"posture drift after hold: {drift:.4f} rad")

# vmapped CMC over a trajectory of torque setpoints
taus = jnp.linspace(0.0, 1.0, 8)[:, None] * tau_des[None, :]
acts, res = jax.jit(jax.vmap(computed_muscle_control))(taus)
print("batched CMC residuals:", np.round(np.asarray(res), 4))
assert np.all(np.asarray(res) < 10.0)
