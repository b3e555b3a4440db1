"""Tutorial 5 — Move hand fingers.

Role parity: /root/reference/tutorials/5_Move_Hand_Fingers.ipynb (drive
individual muscles of the myoHand and watch joints respond). Shows the
sigmoid action projection, MuJoCo muscle activation dynamics (tau
act/deact), and how single-muscle excitation maps to joint motion
through the tendon moment arms.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

import myosuite_tpu

SMOKE = os.environ.get("MTX_TUTORIAL_SMOKE") == "1"

env = myosuite_tpu.make("MtxHandPoseFixed-v0")
nu = env.action_size
print(f"myoHand: {nu} muscles")

state0 = jax.jit(env.reset)(jax.random.PRNGKey(0))

# step_ctrl bypasses the sigmoid projection: ctrl IS the excitation
step_ctrl = jax.jit(env.step_ctrl)

def excite(muscle_id, steps):
    """Excite one muscle fully, everything else silent."""
    ctrl = jnp.zeros(nu).at[muscle_id].set(1.0)
    state = state0
    acts, qs = [], []
    for _ in range(steps):
        state = step_ctrl(state, ctrl)
        acts.append(float(state.data.act[muscle_id]))
        qs.append(np.asarray(state.data.qpos))
    return np.array(acts), np.stack(qs)

steps = 5 if SMOKE else 40
for muscle in range(0, nu, max(1, nu // (3 if SMOKE else 8))):
    acts, qs = excite(muscle, steps)
    moved = np.abs(qs[-1] - qs[0])
    print(f"muscle {muscle:>2d}: act {acts[0]:.2f}->{acts[-1]:.2f}, "
          f"most-moved joint {int(moved.argmax())} ({moved.max():.3f} rad)")

# activation dynamics: excitation rises with tau_act, falls with tau_deact
acts_up, _ = excite(0, steps)
assert acts_up[-1] > acts_up[0], "activation should rise under excitation"
print("activation rise profile:", np.round(acts_up[:10], 3))
