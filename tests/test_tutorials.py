"""Execute every tutorial script as a test.

Role parity: the reference runs its notebooks as tests
(/root/reference/myosuite/tests/test_tutorials.sh via nbconvert
ExecutePreprocessor). Here the tutorials are plain scripts; each runs
in-process (sharing the jax compile cache) with MTX_TUTORIAL_SMOKE=1
shrinking sizes to CI scale. The heaviest ones (training, hand/leg model
compiles, myodm) are marked slow and run in the FULL tier.
"""

import os
import runpy

import pytest

TUTORIAL_DIR = os.path.join(os.path.dirname(__file__), os.pardir,
                            "tutorials")

FAST_SET = [
    "01_get_started.py",
    "02_load_policy.py",
    "03_analyse_movements.py",
    "06_inverse_dynamics.py",
    "07_fatigue_modeling.py",
    "08_inverse_kinematics.py",
    "09_computed_muscle_control.py",
    "12_scaleout_sharding.py",
]
SLOW_SET = [
    "04_train_policy.py",
    "05_move_hand_fingers.py",
    "10_playback_motion.py",
    "11_reflex_controller.py",
]


def _run(script):
  os.environ["MTX_TUTORIAL_SMOKE"] = "1"
  try:
    runpy.run_path(os.path.join(TUTORIAL_DIR, script), run_name="__main__")
  finally:
    os.environ.pop("MTX_TUTORIAL_SMOKE", None)


def test_all_tutorials_listed():
  scripts = sorted(f for f in os.listdir(TUTORIAL_DIR) if f.endswith(".py"))
  assert scripts == sorted(FAST_SET + SLOW_SET), scripts


@pytest.mark.parametrize("script", FAST_SET)
def test_tutorial(script):
  _run(script)


@pytest.mark.slow
@pytest.mark.parametrize("script", SLOW_SET)
def test_tutorial_slow(script):
  _run(script)
