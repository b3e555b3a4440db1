"""Tutorial 3 — Analyse movements.

Role parity: /root/reference/tutorials/3_Analyse_movements.ipynb (log a
rollout to a Trace, inspect muscle activations/joint kinematics, plot).
Here the rollout is one compiled scan; the Trace saves h5/pickle and the
analysis runs on the stacked arrays.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

import myosuite_tpu
from myosuite_tpu.logger.trace import Trace

SMOKE = os.environ.get("MTX_TUTORIAL_SMOKE") == "1"

env = myosuite_tpu.make("MtxFingerPoseRandom-v0")
horizon = 10 if SMOKE else 100

# --- scan rollout collecting physics quantities ----------------------------
def rollout(rng):
    state = env.reset(rng)

    def body(carry, _):
        state, rng = carry
        rng, sub = jax.random.split(rng)
        action = jax.random.uniform(sub, (env.action_size,))
        nxt = env.step(state, action)
        out = dict(qpos=nxt.data.qpos, qvel=nxt.data.qvel,
                   act=nxt.data.act, ctrl=action,
                   muscle_force=nxt.data.actuator_force,
                   reward=nxt.reward)
        return (nxt, rng), out

    (_, _), traj = jax.lax.scan(body, (state, jax.random.PRNGKey(1)),
                                None, length=horizon)
    return traj

traj = jax.jit(rollout)(jax.random.PRNGKey(0))
traj = {k: np.asarray(v) for k, v in traj.items()}

# --- muscle activity analysis ----------------------------------------------
act = traj["act"]                                # (T, muscles)
print("mean activation per muscle:", np.round(act.mean(0), 3))
print("peak muscle force [N]:", np.round(np.abs(traj["muscle_force"]).max(0), 2))
print("joint excursion [rad]:",
      np.round(traj["qpos"].max(0) - traj["qpos"].min(0), 3))

# --- persist as a Trace ----------------------------------------------------
trace = Trace("analyse_movements")
trace.create_group("rollout0")
for t in range(horizon):
    trace.append_datums("rollout0",
                        {k: v[t] for k, v in traj.items()})
trace.stack()
with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, "movements.pickle")
    trace.save(path)
    reloaded = Trace.load(path)
    assert np.allclose(reloaded["rollout0"]["act"], act, atol=1e-6)
    print("trace round-trip ok:", path)

# --- optional plot ---------------------------------------------------------
try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
    axes[0].plot(traj["qpos"])
    axes[0].set_ylabel("qpos [rad]")
    axes[1].plot(act)
    axes[1].set_ylabel("muscle activation")
    axes[1].set_xlabel("step")
    out = os.path.join(tempfile.gettempdir(), "movements.png")
    fig.savefig(out, dpi=60)
    print("saved plot:", out)
except ImportError:
    print("matplotlib not installed; skipping plot")
