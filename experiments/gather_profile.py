"""Which part of gather_tiles is slow on TPU: take or transpose?"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np

NB, M, F, SUB, LANES = 8192, 192, 9, 32, 128
NC = 250000
rng = np.random.default_rng(0)
pack = jnp.asarray(rng.standard_normal((NC + 1, F * SUB)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, NC, (NB, M)).astype(np.int32))
mg = M * SUB // LANES

@jax.jit
def take_only(pack, idx):
    return jnp.take(pack, idx, axis=0)  # (NB, M, F*SUB)

@jax.jit
def take_sorted(pack, idx):
    return jnp.take(pack, jnp.sort(idx, axis=1), axis=0)

@jax.jit
def transpose_only(g):
    g = g.reshape(NB, mg, 4, F, SUB).swapaxes(2, 3)
    return g.reshape(NB * mg * F, LANES)

@jax.jit
def full(pack, idx):
    return transpose_only(take_only(pack, idx))

def timeit(name, fn, *args, reps=3):
    out = fn(*args); _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:8])
    t = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:8])
    print(f"{name:20s} {(time.perf_counter()-t)/reps*1000:9.2f} ms", flush=True)

g = take_only(pack, idx)
timeit("take_only", take_only, pack, idx)
timeit("take_sorted", take_sorted, pack, idx)
timeit("transpose_only", transpose_only, g)
timeit("take+transpose", full, pack, idx)
