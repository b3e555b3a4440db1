"""Tutorial 11 — Reflex pathway controller (Song & Geyer 2015).

Role parity: /root/reference/tutorials/4b_reflex (spinal reflex
controller on the myoLeg). The JAX version runs the M1-M5 reflex
pathways inside the jitted rollout; `tools/tune_reflex.py` re-tunes the
gains with TPU-batched CMA-ES (a whole population evaluated as one
vmapped rollout per generation).

SCOPE: on this procedural leg model the tuned gains demonstrate the
reflex PATHWAYS (stance/swing modulation, force/length feedback), not a
stable gait — the best CMA-ES champion stays upright ~2.6 s and travels
~0.4 m (agents/pretrained/reflex_gait.json carries the measured
numbers). The reference's hand-tuned gains target its mocap-calibrated
myoLeg; treat this as a pathway-model demo, not a locomotion baseline.
"""

import json
import os

import jax
import numpy as np

import jax.numpy as jnp

import myosuite_tpu
from myosuite_tpu.agents.reflex import ReflexController, ReflexParams

SMOKE = os.environ.get("MTX_TUTORIAL_SMOKE") == "1"

env = myosuite_tpu.make("MtxLegWalk-v0")
ctl = ReflexController(env)

# load the shipped tuned gains
gains_path = os.path.join(os.path.dirname(myosuite_tpu.__file__),
                          "agents", "pretrained", "reflex_gait.json")
with open(gains_path) as f:
    tuned = json.load(f)
print("tuned gains:", {k: round(v, 4) for k, v in tuned["params"].items()})
from myosuite_tpu.agents.reflex import default_params
gains = default_params()._asdict()
gains.update(tuned["params"])            # json may predate newer gains
ctl = ReflexController(env, params=ReflexParams(
    **{k: jnp.float32(v) for k, v in gains.items()}))

horizon = 20 if SMOKE else 350
state, (rewards, solved, x) = ctl.rollout(jax.random.PRNGKey(0),
                                          horizon=horizon)
dist = float(np.asarray(x)[-1] - np.asarray(x)[0])
print(f"walked {dist:.2f} m in {horizon * env.dt:.1f} s "
      f"(mean reward {float(np.asarray(rewards).mean()):.2f})")
if not SMOKE:
    assert dist > 0.0, "reflex gait should move forward"
