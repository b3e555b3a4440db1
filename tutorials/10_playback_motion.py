"""Tutorial 10 — Play back a motion file.

Role parity: /root/reference/tutorials/10_PlaybackMotFile.ipynb and the
`examine_reference` CLI (play a GRAB .npz reference through a MyoDM
TrackEnv). We write a reference-schema .npz, load it with
ReferenceMotion.from_npz, build an ObjTrackEnv around it, and track the
motion, logging the tracking error per frame.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

import myosuite_tpu
from myosuite_tpu.envs.myodm import make_track_env, _track_config, _hand_jnt_range
from myosuite_tpu.logger.reference_motion import ReferenceMotion, RefType

SMOKE = os.environ.get("MTX_TUTORIAL_SMOKE") == "1"

# --- a MyoDM tracking env with its built-in min-jerk motion ----------------
env = myosuite_tpu.make("MtxHandAppleLift-v0")
state = jax.jit(env.reset)(jax.random.PRNGKey(0))
step = jax.jit(env.step)
for _ in range(5 if SMOKE else 50):
    state = step(state, jnp.zeros(env.action_size))
print("tracking reward after playback steps:", float(state.reward))

# --- write + load a reference-schema npz -----------------------------------
_, nq_hand = _hand_jnt_range()
horizon = 40
t = np.linspace(0.0, 2.0, horizon).astype(np.float32)
robot = 0.1 * np.sin(t[:, None] + np.arange(nq_hand)[None, :]).astype(np.float32)
obj = np.concatenate([
    np.stack([0.0 * t, 0.05 * t, 1.0 + 0.05 * t], axis=1),       # lift up
    np.tile([1.0, 0.0, 0.0, 0.0], (horizon, 1))], axis=1).astype(np.float32)

with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, "lift.npz")
    np.savez(path, time=t, robot=robot,
             robot_vel=np.gradient(robot, t, axis=0).astype(np.float32),
             object=obj)
    ref = ReferenceMotion.from_npz(path)
    assert ref.ref_type == RefType.TRACK
    print(f"loaded npz reference: {horizon} frames, "
          f"{ref.robot.shape[1]} robot dofs")

    # build a TrackEnv around the loaded motion (examine_reference role)
    from myosuite_tpu.envs.tracking import ObjTrackEnv
    env2 = ObjTrackEnv(_track_config("apple"), None, reference=ref)
    s = jax.jit(env2.reset)(jax.random.PRNGKey(1))
    step2 = jax.jit(env2.step)
    errs = []
    for _ in range(5 if SMOKE else horizon):
        s = step2(s, jnp.zeros(env2.action_size))
        errs.append(float(jnp.linalg.norm(s.obs_dict["obj_com_err"])
                          if hasattr(s, "obs_dict") else s.reward))
    print("per-step tracking signal:", np.round(errs[:8], 3))
print("npz playback complete")
