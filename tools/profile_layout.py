"""Layout microbenchmark: effective bandwidth of elementwise chains on
different array layouts, plus gather-row costs. Barriers between ops so
XLA cannot fuse the chain into one kernel.

Establishes the TPU layout facts the march design rests on:
  - (N,)    1D
  - (N/128, 128) packed 2D
  - (N, 3)  AoS (last dim pads to 128 lanes?)
  - (3, N)  component-major 2D
  - (H, W)  image-shaped
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, "assets", "cache")
jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 921600
REPS = 32


def chain(x):
    for _ in range(REPS):
        x = x * 1.000001 + 1e-9
        (x,) = jax.lax.optimization_barrier((x,))
    return x


cj = jax.jit(chain)


def timeit(fn, *args, n=8):
    r = fn(*args)
    r = fn(*args)
    _ = float(np.asarray(r).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _ = float(np.asarray(r).reshape(-1)[0])
    return (time.perf_counter() - t0) / n


def bench_shape(label, shape):
    x = jnp.ones(shape, jnp.float32)
    dt = timeit(cj, x)
    useful = np.prod(shape) * 4 * 2 * REPS  # read+write per op
    print(f"{label:22s} {dt*1000:7.2f} ms/chain  "
          f"{useful/dt/1e9:8.1f} GB/s useful", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    # reference point for machine speed comparison across runs
    bench_shape("(7200,128) packed", (7200, 128))
    bench_shape("(N,) 1d", (N,))
    bench_shape("(N,3) aos", (N, 3))
    bench_shape("(3,N) soa2d", (3, N))
    bench_shape("(720,1280) image", (720, 1280))
    bench_shape("(8,115200) soa8", (8, 115200))

    # gathers: (N,) idx from tables of different row widths
    for W in (1, 4, 128):
        tab = jnp.ones((32768, W), jnp.float32) if W > 1 else jnp.ones(
            (32768,), jnp.float32)
        idx = jnp.asarray(
            np.random.default_rng(0).integers(0, 32768, N, dtype=np.int32))

        @jax.jit
        def g(tab, idx):
            out = jnp.take(tab, idx, axis=0)
            s = out.sum()
            return s

        dt = timeit(g, tab, idx)
        print(f"gather W={W:4d}: {dt*1000:7.2f} ms  "
              f"{N/dt/1e6:7.1f} M rows/s", flush=True)


if __name__ == "__main__":
    main()
