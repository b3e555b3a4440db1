"""Tune the reflex controller's gains with TPU-batched evolutionary search.

The reference's reflex baseline ships hand-tuned gains for the real
myoLeg (/root/reference/myosuite/agents/baseline_Reflex/reflexCtr.py:23);
our leg model differs, so the gains are re-tuned here the TPU-native way:
every generation evaluates a whole population of gain vectors as ONE
vmapped rollout (pop x horizon batched physics), then mutates the elites.

Writes the best parameter vector + gait metrics to
myosuite_tpu/agents/pretrained/reflex_gait.json (committed artifact; the
VERDICT r3 #10 stable-gait demonstration).

Run: python tools/tune_reflex.py [--gens 30] [--pop 256] [--horizon 300]
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import argparse
import json
import os

import jax

from myosuite_tpu.utils import jax_cache_dir

if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
  jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import myosuite_tpu
from myosuite_tpu.agents import reflex as reflex_mod


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--gens", type=int, default=30)
  p.add_argument("--pop", type=int, default=256)
  p.add_argument("--horizon", type=int, default=350)   # 7 s at dt=0.02
  p.add_argument("--seed", type=int, default=0)
  p.add_argument("--spread", type=float, default=0.3,
                 help="log-normal spread of the initial population "
                      "(ES) / initial step size (CMA)")
  p.add_argument("--algo", choices=["es", "cma"], default="cma")
  p.add_argument("--cold", action="store_true",
                 help="ignore the committed champion, start from defaults")
  p.add_argument("--out", default=None)
  args = p.parse_args()

  env = myosuite_tpu.make("MtxLegWalk-v0")
  ctl = reflex_mod.ReflexController(env)
  base = ctl.params
  flat0 = jnp.stack([jnp.float32(x) for x in base])
  n_par = flat0.shape[0]
  min_height = float(env._config.min_height)
  dt = float(env.dt)

  target_v = float(env._config.get("target_velocity", 1.2))

  def rollout_fitness(flat_params, rng, horizon):
    params = reflex_mod.ReflexParams(*[flat_params[i] for i in range(n_par)])

    stand_h = float(env._config.get("stand_height", 0.96))

    def body(carry, _):
      state, alive = carry
      ctrl = ctl(state.data, params)
      state = env.step_ctrl(state, ctrl)
      h = state.data.site_xpos[env._pelvis_site][2]
      alive = alive * (h > min_height)
      # posture shaping: reward keeping pelvis near stand height while
      # alive, so the search gradient exists before full-episode survival
      posture = alive * jnp.clip(
          (h - min_height) / max(stand_h - min_height, 1e-6), 0.0, 1.0)
      # velocity tracking (the walk task's own two-gaussian criterion):
      # pushes the search from "stand still" toward gait at target speed
      vtrack = alive * (jnp.exp(-jnp.square(state.data.qvel[0] - target_v))
                        + jnp.exp(-jnp.square(state.data.qvel[1])))
      return (state, alive), (alive, alive * state.data.qpos[0], posture,
                              vtrack)

    state0 = env.reset(rng)
    x0 = state0.data.qpos[0]
    (_, _), (alive_t, x_t, post_t, v_t) = jax.lax.scan(
        body, (state0, jnp.float32(1.0)), None, length=horizon)
    upright_s = jnp.sum(alive_t) * dt
    dist = jnp.max(x_t) - x0
    fitness = (upright_s + 2.0 * dist + 0.5 * jnp.sum(post_t) * dt
               + 1.0 * jnp.sum(v_t) * dt)
    return fitness, upright_s, dist

  def multi_seed_fitness(flat_params, rng):
    # average over episodes: single-seed fitness overfits one terrain/
    # target draw and the champion fails fresh seeds
    rngs = jax.random.split(rng, 2)
    f, u, d = jax.vmap(
        lambda r: rollout_fitness(flat_params, r, args.horizon))(rngs)
    return f.mean(), u.mean(), d.mean()

  v_fit = jax.jit(jax.vmap(multi_seed_fitness, in_axes=(0, None)))

  rng = jax.random.PRNGKey(args.seed)
  out_path = args.out or os.path.join(
      os.path.dirname(__file__), "..", "myosuite_tpu", "agents",
      "pretrained", "reflex_gait.json")
  if os.path.exists(out_path) and not args.cold:
    with open(out_path) as f:   # warm start from the committed champion
      prev = json.load(f)["params"]
    # fields added since the champion was tuned fall back to defaults
    merged = {k: float(v) for k, v in
              zip(reflex_mod.ReflexParams._fields, flat0)}
    merged.update(prev)
    flat0 = jnp.asarray([merged[k] for k in reflex_mod.ReflexParams._fields],
                        dtype=jnp.float32)
    print("warm start from", out_path, flush=True)

  best, best_fit, best_stats = np.asarray(flat0), -1e9, (0.0, 0.0)

  if args.algo == "cma":
    # CMA-ES in log-parameter space (all gains positive, scales differ by
    # orders of magnitude): candidate = flat0 * exp(x), x ~ N(m, sigma^2 C).
    # Standard rank-mu update (Hansen 2016 tutorial equations).
    n = int(n_par)
    lam = args.pop
    mu = lam // 4
    w = np.log(mu + 0.5) - np.log(np.arange(1, mu + 1))
    w /= w.sum()
    mu_eff = 1.0 / np.sum(w ** 2)
    c_sigma = (mu_eff + 2) / (n + mu_eff + 5)
    d_sigma = 1 + 2 * max(0, np.sqrt((mu_eff - 1) / (n + 1)) - 1) + c_sigma
    c_c = (4 + mu_eff / n) / (n + 4 + 2 * mu_eff / n)
    c_1 = 2 / ((n + 1.3) ** 2 + mu_eff)
    c_mu = min(1 - c_1, 2 * (mu_eff - 2 + 1 / mu_eff)
               / ((n + 2) ** 2 + mu_eff))
    chi_n = np.sqrt(n) * (1 - 1 / (4 * n) + 1 / (21 * n ** 2))
    mean = np.zeros(n)
    sigma = args.spread
    C = np.eye(n)
    p_sigma = np.zeros(n)
    p_c = np.zeros(n)
    base = np.asarray(flat0, dtype=np.float64)
    for g in range(args.gens):
      rng, r_ep, r_s = jax.random.split(rng, 3)
      eig_vals, eig_vecs = np.linalg.eigh(C)
      eig_vals = np.maximum(eig_vals, 1e-12)
      A = eig_vecs @ np.diag(np.sqrt(eig_vals))
      z = np.asarray(jax.random.normal(r_s, (lam, n)))
      y = z @ A.T                       # ~ N(0, C)
      xs = mean[None] + sigma * y
      cand = base[None] * np.exp(xs)
      cand[0] = best                    # elitist candidate
      fit, upright, dist = v_fit(jnp.asarray(cand, dtype=jnp.float32), r_ep)
      fit_np = np.asarray(fit)
      order = np.argsort(-fit_np)
      if fit_np[order[0]] > best_fit:
        best_fit = float(fit_np[order[0]])
        best = np.asarray(cand[order[0]], dtype=np.float32)
        best_stats = (float(upright[order[0]]), float(dist[order[0]]))
      sel = order[:mu]
      y_sel = y[sel]
      y_w = w @ y_sel
      mean = mean + sigma * y_w
      # step-size path (C^-1/2 y_w)
      inv_sqrt = eig_vecs @ np.diag(1 / np.sqrt(eig_vals)) @ eig_vecs.T
      p_sigma = ((1 - c_sigma) * p_sigma
                 + np.sqrt(c_sigma * (2 - c_sigma) * mu_eff)
                 * (inv_sqrt @ y_w))
      sigma *= np.exp(c_sigma / d_sigma
                      * (np.linalg.norm(p_sigma) / chi_n - 1))
      h_sigma = (np.linalg.norm(p_sigma)
                 / np.sqrt(1 - (1 - c_sigma) ** (2 * (g + 1)))
                 < (1.4 + 2 / (n + 1)) * chi_n)
      p_c = ((1 - c_c) * p_c
             + h_sigma * np.sqrt(c_c * (2 - c_c) * mu_eff) * y_w)
      rank_mu = (y_sel.T * w) @ y_sel
      C = ((1 - c_1 - c_mu) * C
           + c_1 * (np.outer(p_c, p_c)
                    + (not h_sigma) * c_c * (2 - c_c) * C)
           + c_mu * rank_mu)
      print(f"gen {g}: best_fit={best_fit:.2f} sigma={sigma:.3f} "
            f"upright={best_stats[0]:.2f}s dist={best_stats[1]:.2f}m",
            flush=True)
  else:
    pop = jnp.tile(flat0[None], (args.pop, 1))
    rng, r0 = jax.random.split(rng)
    # log-normal spread around the starting point
    pop = pop * jnp.exp(args.spread * jax.random.normal(r0, pop.shape))
    pop = pop.at[0].set(flat0)
    for g in range(args.gens):
      rng, r_ep, r_mut = jax.random.split(rng, 3)
      fit, upright, dist = v_fit(pop, r_ep)
      fit_np = np.asarray(fit)
      order = np.argsort(-fit_np)
      if fit_np[order[0]] > best_fit:
        best_fit = float(fit_np[order[0]])
        best = np.asarray(pop[order[0]])
        best_stats = (float(upright[order[0]]), float(dist[order[0]]))
      elites = pop[jnp.asarray(order[: args.pop // 8])]
      reps = args.pop // elites.shape[0]
      parents = jnp.tile(elites, (reps, 1))[: args.pop]
      noise = jnp.exp(0.12 * jax.random.normal(r_mut, parents.shape))
      pop = parents * noise
      pop = pop.at[0].set(jnp.asarray(best))   # elitism
      print(f"gen {g}: best_fit={best_fit:.2f} "
            f"upright={best_stats[0]:.2f}s dist={best_stats[1]:.2f}m",
            flush=True)

  # final evaluation of the champion on fresh seeds at a 10 s horizon
  # (the sustained-gait bar is longer than the tuning horizon)
  eval_horizon = max(args.horizon, 500)
  eval_fn = jax.jit(lambda p, r: rollout_fitness(p, r, eval_horizon))
  fits = []
  for s in range(8):
    f, u, d = eval_fn(jnp.asarray(best), jax.random.PRNGKey(100 + s))
    fits.append((float(u), float(d)))
  payload = {
      "env": "MtxLegWalk-v0",
      "algo": args.algo,
      "horizon_s": args.horizon * dt,
      "eval_horizon_s": eval_horizon * dt,
      "params": {f: float(v) for f, v in
                 zip(reflex_mod.ReflexParams._fields, best)},
      "eval_upright_s": [u for u, _ in fits],
      "eval_distance_m": [d for _, d in fits],
      "fitness": best_fit,
  }
  with open(os.path.abspath(out_path), "w") as f:
    json.dump(payload, f, indent=2)
  print(json.dumps(payload, indent=2))
  os._exit(0)


if __name__ == "__main__":
  main()
