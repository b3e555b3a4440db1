"""Tutorial 7 — Fatigue modeling.

Role parity: /root/reference/tutorials/7_Fatigue_Modeling.ipynb (3CC-r
cumulative fatigue: active MA, resting MR, fatigued MF compartments).
Any env has an auto-registered `MtxFati*` variant; the wrapper keeps
fatigue state in the State.info pytree, so it batches and scans like
everything else.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

import myosuite_tpu

SMOKE = os.environ.get("MTX_TUTORIAL_SMOKE") == "1"

env = myosuite_tpu.make("MtxFatiElbowPoseFixed-v0")
state = jax.jit(env.reset)(jax.random.PRNGKey(0))
step = jax.jit(env.step)

# hold maximal excitation: MA rises, then decays into MF as fatigue builds
horizon = 20 if SMOKE else 600
full_on = jnp.ones(env.action_size) * 3.0   # sigmoid-saturated "max effort"

ma_hist, mf_hist, mr_hist = [], [], []
for _ in range(horizon):
    state = step(state, full_on)
    fat = state.info["fatigue"]
    ma_hist.append(float(fat["MA"].mean()))
    mr_hist.append(float(fat["MR"].mean()))
    mf_hist.append(float(fat["MF"].mean()))

ma, mr, mf = map(np.array, (ma_hist, mr_hist, mf_hist))
print(f"after {horizon} steps of max effort:")
print(f"  active   MA {ma[0]:.3f} -> {ma[-1]:.3f}")
print(f"  resting  MR {mr[0]:.3f} -> {mr[-1]:.3f}")
print(f"  fatigued MF {mf[0]:.3f} -> {mf[-1]:.3f}")

# conservation: compartments always sum to 1
total = ma + mr + mf
assert np.allclose(total, 1.0, atol=1e-3), total.max()
# fatigue accumulates monotonically under sustained effort
assert mf[-1] > mf[0]
if not SMOKE:
    assert mf[-1] > 0.01, "sustained max effort should build fatigue"
print("3CC-r invariants hold (MA+MR+MF=1, MF monotone under load)")
