"""Tutorial 8 — Inverse kinematics.

Role parity: /root/reference/tutorials/8_inverse_kinematics.py
(dm_control-style damped-least-squares IK to place a site at a target).
The JAX version jits and vmaps: solve IK for a whole batch of targets at
once — useful for generating reset states on device.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

import myosuite_tpu
from myosuite_tpu.utils.inverse_kinematics import qpos_from_site_pose

SMOKE = os.environ.get("MTX_TUTORIAL_SMOKE") == "1"

env = myosuite_tpu.make("MtxFingerReachFixed-v0")
m = env.model
state = jax.jit(env.reset)(jax.random.PRNGKey(0))

# pick the fingertip site (the task's own end-effector)
site_names = [env.mj_model.site(i).name for i in range(env.mj_model.nsite)]
tip_id = next(i for i, n in enumerate(site_names) if "tip" in n.lower())
print("solving IK for site:", site_names[tip_id])

# where is the tip now, and where do we want it?
from myosuite_tpu.physics import kinematics
d0 = kinematics.com_pos(m, kinematics.kinematics(m, state.data))
cur = np.asarray(d0.site_xpos[tip_id])
target = jnp.asarray(cur + np.array([0.01, -0.01, 0.015]))

result = jax.jit(qpos_from_site_pose, static_argnums=2)(
    m, state.data, tip_id, target)
print(f"converged in {int(result.steps)} steps, "
      f"residual {float(result.err_norm):.2e} m")
assert float(result.err_norm) < 1e-3

# --- batched IK: 64 random targets in one vmapped solve --------------------
n = 8 if SMOKE else 64
targets = jnp.asarray(cur) + 0.02 * jax.random.normal(
    jax.random.PRNGKey(1), (n, 3))
batch_ik = jax.jit(jax.vmap(
    lambda t: qpos_from_site_pose(m, state.data, tip_id, t)))
res = batch_ik(targets)
ok = np.asarray(res.err_norm) < 2e-3
print(f"batched IK: {ok.sum()}/{n} targets reached "
      f"(median residual {np.median(np.asarray(res.err_norm)):.2e} m)")
assert ok.mean() > 0.5, "most nearby targets should be reachable"
