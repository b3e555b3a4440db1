import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os, time
import jax

from myosuite_tpu.utils import jax_cache_dir

# machine-keyed cache: cross-machine XLA:CPU AOT entries execute wrong
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
  jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax, jax.numpy as jnp
import numpy as np

B, N = 2048, 23
key = jax.random.PRNGKey(0)
A = jax.random.normal(key, (B, N, N))
M = jnp.einsum('bij,bkj->bik', A, A) + 10*jnp.eye(N)
rhs = jax.random.normal(key, (B, N))

def timef(name, f, *a, iters=20):
  jf = jax.jit(f)
  o = jf(*a); jax.block_until_ready(o)
  t0=time.perf_counter()
  for _ in range(iters): o = jf(*a)
  jax.block_until_ready(o)
  print(f"{name:28s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms")
  return o

# inside-scan versions: repeat solve 100x sequentially to amortize dispatch
def scan100(solve):
  def f(M, rhs):
    def body(r, _):
      x = solve(M, r)
      return x / (1.0 + jnp.max(jnp.abs(x))), None   # force dependency
    r, _ = jax.lax.scan(body, rhs, None, length=100)
    return r
  return f

def chol_solve(M, rhs):
  c = jnp.linalg.cholesky(M)
  return jax.vmap(lambda cc, rr: jax.scipy.linalg.cho_solve((cc, True), rr))(c, rhs)

def lin_solve(M, rhs):
  return jnp.linalg.solve(M, rhs[..., None])[..., 0]

def unrolled_chol(M):
  # batched unrolled cholesky: python loop over columns
  L = jnp.zeros_like(M)
  Mw = M
  for j in range(N):
    djj = jnp.sqrt(Mw[:, j, j])
    col = Mw[:, :, j] / djj[:, None]            # (B, N)
    mask = (jnp.arange(N) >= j)
    col = col * mask
    L = L.at[:, :, j].set(col)
    Mw = Mw - col[:, :, None] * col[:, None, :]
  return L

def unrolled_solve(M, rhs):
  L = unrolled_chol(M)
  # forward substitution unrolled
  y = jnp.zeros_like(rhs)
  for i in range(N):
    y = y.at[:, i].set((rhs[:, i] - jnp.einsum('bj,bj->b', L[:, i, :i], y[:, :i])) / L[:, i, i])
  x = jnp.zeros_like(rhs)
  for i in reversed(range(N)):
    x = x.at[:, i].set((y[:, i] - jnp.einsum('bj,bj->b', L[:, i+1:, i], x[:, i+1:])) / L[:, i, i])
  return x

def cg_solve(M, rhs, iters=25):
  dinv = 1.0 / jnp.diagonal(M, axis1=1, axis2=2)
  x = rhs * dinv
  r = rhs - jnp.einsum('bij,bj->bi', M, x)
  z = r * dinv
  p = z
  rz = jnp.einsum('bi,bi->b', r, z)
  for _ in range(iters):
    Mp = jnp.einsum('bij,bj->bi', M, p)
    alpha = rz / jnp.maximum(jnp.einsum('bi,bi->b', p, Mp), 1e-30)
    x = x + alpha[:, None] * p
    r = r - alpha[:, None] * Mp
    z = r * dinv
    rz_new = jnp.einsum('bi,bi->b', r, z)
    p = z + (rz_new / jnp.maximum(rz, 1e-30))[:, None] * p
    rz = rz_new
  return x

x_ref = timef("chol+cho_solve x1", chol_solve, M, rhs)
timef("linalg.solve x1", lin_solve, M, rhs)
x_u = timef("unrolled chol x1", unrolled_solve, M, rhs)
x_c = timef("CG25 x1", cg_solve, M, rhs)
print("unrolled err:", float(jnp.max(jnp.abs(x_u - x_ref))), " cg err:", float(jnp.max(jnp.abs(x_c - x_ref))))
timef("chol+cho_solve scan100", scan100(chol_solve), M, rhs, iters=3)
timef("linalg.solve scan100", scan100(lin_solve), M, rhs, iters=3)
timef("unrolled chol scan100", scan100(unrolled_solve), M, rhs, iters=3)
timef("CG25 scan100", scan100(cg_solve), M, rhs, iters=3)
