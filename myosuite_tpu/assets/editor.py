"""Procedural model surgery via MjSpec (the reference's myoedits role).

Mirrors the reference's ModelEditor load-edit-compile pipeline
(/root/reference/myosuite/envs/myo/myoedits/model_editor.py:13-37) and its
arm-reaching edit (delete the hand digits, rebuild an IFtip end-effector
site; myoedits/__init__.py:23-120), operating on our procedurally authored
XML strings instead of simhive files.
"""

from __future__ import annotations

from typing import Callable, Optional

import mujoco


class ModelEditor:
  """Load an MJCF string into an MjSpec, apply an edit_fn, re-emit XML."""

  def __init__(self, xml: str):
    self.spec = mujoco.MjSpec.from_string(xml)

  def edit(self, edit_fn: Optional[Callable] = None) -> "ModelEditor":
    if edit_fn is not None:
      edit_fn(self.spec)
    return self

  def to_xml(self) -> str:
    self.spec.compile()
    return self.spec.to_xml()


def edit_fn_arm_reaching(spec: mujoco.MjSpec) -> None:
  """Delete all digits (and their tendons/muscles) from an arm model and
  re-create the IFtip site on the palm as the reach end-effector.

  Reference semantics: myoedits/__init__.py:23-88 deletes hand digit bodies
  and rebuilds the IFtip site to make myoArmReach envs.
  """
  palm = spec.body("palm")
  digit_roots = [b for b in spec.bodies
                 if b.name in ("TH_meta", "IF_prox", "MF_prox", "RF_prox",
                               "LF_prox")]
  removed_prefixes = ("TH", "IF", "MF", "RF", "LF")
  for b in digit_roots:
    spec.delete(b)
  # drop tendons that referenced deleted sites, then their muscles
  kept_tendons = set()
  for t in list(spec.tendons):
    if t.name.startswith(removed_prefixes):
      spec.delete(t)
    else:
      kept_tendons.add(t.name)
  for a in list(spec.actuators):
    if a.target not in kept_tendons:
      spec.delete(a)
  # orphaned palm-level origin sites of the deleted digit muscles
  for s in list(spec.sites):
    if s.name.startswith(removed_prefixes) and "_" in s.name:
      try:
        spec.delete(s)
      except Exception:
        pass
  palm.add_site(name="IFtip", pos=[0, 0.026, -0.12], size=[0.005, 0, 0])


def build_arm_reach_xml() -> str:
  """Arm model with digits removed for end-effector reaching."""
  from myosuite_tpu.assets import builder, hand

  # finalize (inject muscle lengthranges) BEFORE surgery: the surviving
  # wrist/arm muscles keep their ranges through the MjSpec round-trip
  xml = builder.finalize_muscles(hand.build_hand(arm=True))
  return ModelEditor(xml).edit(edit_fn_arm_reaching).to_xml()
