"""Feasibility probe for the sub-8 force stream (r4 verdict #1a).

The planned sub-8 path halves the force pass's true-hit lane volume
(552 -> ~320 lanes/particle) but needs a gather at HALF-row (64-lane)
granularity: pack rows hold one 8-particle subblock = 8 fields x 8
lanes = 64 lanes, and the stream pairs two gathered half-rows per
128-lane tile row via reshape. Whether that wins depends entirely on
how XLA lowers take-from-(N, 64) + reshape on TPU — a physically
lane-padded intermediate would double the bytes back.

Measures, at 1M-like sizes on the live chip (useful bytes equal in all
variants):

  base128   take (NC16, 128) rows with S ids          [current gather]
  half64    take (NC8, 64) rows with 2S ids + reshape (S, 128)
  half64s   same, ids sorted per row                   [hit lists are]
  pair_add  two 128-lane takes of lo/hi packs + add    [no reshape]

Run:  python experiments/gather8_probe.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

NB4 = 31248          # query subgroups at 1M (nb * QG)
S16 = 40             # live 16-wide hit slots per subgroup (~552 lanes)
S8 = 48              # live 8-wide hit slots per subgroup (~384 lanes)
NC16 = 62500         # 16-wide subblocks at 1M
NC8 = 125000

rng = np.random.default_rng(0)
pack16 = jnp.asarray(rng.standard_normal((NC16 + 1, 128)).astype(np.float32))
pack8 = jnp.asarray(rng.standard_normal((NC8 + 1, 64)).astype(np.float32))
pack8_lo = jnp.pad(pack8, ((0, 0), (0, 64)))
pack8_hi = jnp.pad(pack8, ((0, 0), (64, 0)))

# clustered ids (hits are spatially local in Morton order): a random
# base per subgroup + small sorted offsets
base16 = rng.integers(0, NC16 - 512, (NB4, 1))
ids16 = jnp.asarray(
    np.sort(base16 + rng.integers(0, 512, (NB4, S16)), axis=1).astype(np.int32)
)
base8 = base16 * 2
ids8 = jnp.asarray(
    np.sort(base8 + rng.integers(0, 1024, (NB4, S8)), axis=1).astype(np.int32)
)
ids8u = jnp.asarray(
    (base8 + rng.integers(0, 1024, (NB4, S8))).astype(np.int32)
)


@jax.jit
def base128(ids):
    return jnp.take(pack16, ids.reshape(-1), axis=0)


@jax.jit
def half64(ids):
    g = jnp.take(pack8, ids.reshape(-1), axis=0)  # (NB4*S8, 64)
    return g.reshape(-1, 128)


@jax.jit
def pair_add(ids):
    flat = ids.reshape(-1, 2)
    lo = jnp.take(pack8_lo, flat[:, 0], axis=0)
    hi = jnp.take(pack8_hi, flat[:, 1], axis=0)
    return lo + hi


def timeit(name, fn, ids, useful_bytes, reps=10):
    out = fn(ids)
    np.asarray(out.ravel()[:4])  # sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(ids)
    np.asarray(out.ravel()[:4])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:10s} {dt * 1e3:8.2f} ms   {useful_bytes / dt / 1e9:7.1f} GB/s useful")


ub16 = NB4 * S16 * 512
ub8 = NB4 * S8 * 256
print(f"useful: base128 {ub16 / 1e6:.0f} MB, half64 {ub8 / 1e6:.0f} MB",
      flush=True)
timeit("base128", base128, ids16, ub16)
timeit("half64", half64, ids8, ub8)
timeit("half64u", half64, ids8u, ub8)
timeit("pair_add", pair_add, ids8, ub8)
