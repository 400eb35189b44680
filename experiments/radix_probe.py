"""Chip timing: lax.sort_key_val vs the MXU-scan radix sort at bench
scales (verdict r2 #6). Run ON TPU; prints one JSON line per config.

The radix sort's cost model: ~6 passes x (one-hot + tri-matmul block
scan + tiny global cumsum + two 1M scatters). The open question is
XLA's 1D unique-scatter speed on TPU — if scatters serialize, lax.sort
stays the default (result recorded in BASELINE.md either way).
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from libclsph_tpu.ops.radix_sort import radix_sort_key_val

REPS = 30


def timeit(fn, *args):
    """fn = ONE dispatch chaining REPS sorts; returns ms per sort."""
    np.asarray(fn(*args)[0][:8])  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(r[0][:8])  # real host fetch (tunnel-safe)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / REPS


def chain(fn):
    """Chain sorts so per-dispatch tunnel latency amortises."""

    @jax.jit
    def run(keys, vals):
        def body(c, _):
            k, v = fn(c[0], c[1])
            # feed the result back (xor keeps the key distribution)
            return (k ^ jax.lax.shift_right_logical(k, jnp.uint32(13)) & 0x3FFFFFFF, v), None

        (k, v), _ = jax.lax.scan(body, (keys, vals), None, length=REPS)
        return k, v

    return run


def main():
    for n in (262144, 1048576, 4194304):
        keys = jnp.asarray(
            np.random.default_rng(0).integers(0, 1 << 30, n, dtype=np.uint32)
        )
        vals = jnp.arange(n, dtype=jnp.int32)

        lax_fn = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v))
        rows = {"n": n}
        for tag, fn in [
            ("lax", lax_fn),
            ("radix_b5", lambda k, v: radix_sort_key_val(k, v, bits_per_pass=5)),
            ("radix_b6", lambda k, v: radix_sort_key_val(k, v, bits_per_pass=6)),
            (
                "radix_b5_blk256",
                lambda k, v: radix_sort_key_val(k, v, bits_per_pass=5, block=256),
            ),
            (
                "fused_b5",
                lambda k, v: radix_sort_key_val(k, v, bits_per_pass=5, fused=True),
            ),
            (
                "fused_b6",
                lambda k, v: radix_sort_key_val(k, v, bits_per_pass=6, fused=True),
            ),
            (
                "fused_b5_g32",
                lambda k, v: radix_sort_key_val(
                    k, v, bits_per_pass=5, fused=True, groups=32
                ),
            ),
            (
                "fused_b6_g32_gather",
                lambda k, v: radix_sort_key_val(
                    k, v, bits_per_pass=6, fused=True, groups=32,
                    apply="gather",
                ),
            ),
            (
                "fused_b5_gather",
                lambda k, v: radix_sort_key_val(
                    k, v, bits_per_pass=5, fused=True, apply="gather"
                ),
            ),
            (
                "radix_b5_gather",
                lambda k, v: radix_sort_key_val(
                    k, v, bits_per_pass=5, apply="gather"
                ),
            ),
        ]:
            try:
                ms = timeit(chain(fn), keys, vals)
                rows[tag] = round(ms, 3)
            except Exception as e:  # record, keep probing
                rows[tag] = f"ERROR {type(e).__name__}: {e}"[:200]
        print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
