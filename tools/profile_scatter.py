"""Hash-table gradient scatter formulations on the real TPU.

The training step is linear in rays x samples; the prime suspect is the
backward scatter-add of feature gradients into the hash tables
(12.5M rows/step at the default batch). Compare:
  (a) at[idx].add — what autodiff emits for jnp.take's transpose
  (b) sort + segment_sum, then one vectorized add
  (c) per-corner split scatters (8 smaller scatters)
  (d) forward gather baseline for rate context
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/assets/cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1 << 20          # rows scattered per level-call (~1.57M in the step)
S = 1 << 15          # table rows
W = 4                # feature width
REPS = 20


def timeit(name, fn, args, reps=REPS):
    # chain reps through a data dependency and drain ONE scalar at the
    # end — block_until_ready is unreliable through the axon tunnel
    out = fn(*args)
    float(out.ravel()[0])
    t0 = time.perf_counter()
    acc = None
    for _ in range(reps):
        out = fn(*args)
        acc = out if acc is None else acc + out
    float(acc.ravel()[0])
    dt = (time.perf_counter() - t0) / reps * 1000.0
    rate = N / dt * 1000.0 / 1e6
    print(f"{name:28s} {dt:7.2f} ms   {rate:7.1f} M rows/s", flush=True)


@jax.jit
def scatter_add(idx, vals):
    return jnp.zeros((S, W)).at[idx].add(vals)


@jax.jit
def sort_segment(idx, vals):
    order = jnp.argsort(idx)
    si = idx[order]
    sv = vals[order]
    return jax.ops.segment_sum(sv, si, num_segments=S)


@jax.jit
def split_scatter(idx8, vals8):
    out = jnp.zeros((S, W))
    for c in range(8):
        out = out.at[idx8[c]].add(vals8[c])
    return out


@jax.jit
def gather(idx, table):
    return jnp.take(table, idx, axis=0)


def main():
    k = jax.random.PRNGKey(0)
    idx = jax.random.randint(k, (N,), 0, S, dtype=jnp.int32)
    vals = jax.random.normal(k, (N, W))
    idx8 = idx.reshape(8, N // 8)
    vals8 = vals.reshape(8, N // 8, W)
    table = jax.random.normal(k, (S, W))

    for _ in range(2):
        timeit("at[].add", scatter_add, (idx, vals))
        timeit("sort+segment_sum", sort_segment, (idx, vals))
        timeit("8-way split at[].add", split_scatter, (idx8, vals8))
        timeit("gather (context)", gather, (idx, table))


if __name__ == "__main__":
    main()
