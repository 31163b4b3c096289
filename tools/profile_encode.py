"""Hash-encode variant shootout on the real TPU (native_fast config).

Variants:
  A. per-level batched (N,8)-row gathers (pre-SoA structure)
  B. uniform (L,N) index math + final transpose  (current fast path)
  C. uniform (N,L) index math, no transpose
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

from nerf_glasses_tpu.config import NGPConfig
from nerf_glasses_tpu import constants as C
from nerf_glasses_tpu.ops.hashgrid import (corner_indices_and_weights,
                                           level_constants,
                                           hash_table_init)

cfg = NGPConfig.native_fast()
L = cfg.n_levels
F = cfg.n_features_per_level
scales, res, sizes, dense = level_constants(cfg)
S = int(sizes[0])
MASK = np.uint32(S - 1)
P0, P1, P2 = (np.uint32(C.HASH_PRIMES[0]), np.uint32(C.HASH_PRIMES[1]),
              np.uint32(C.HASH_PRIMES[2]))


def enc_A(table, pos):
    n = pos.shape[0]
    feats = []
    p = pos
    for lvl in range(L):
        idx, w = corner_indices_and_weights(
            p, float(scales[lvl]), int(res[lvl]), int(sizes[lvl]), False)
        vals = jnp.take(table[lvl], idx.reshape(-1), axis=0).reshape(n, 8, -1)
        f = jnp.sum(vals * w[..., None], axis=1)
        feats.append(f[:, :F])
        if lvl + 1 < L:
            p, = jax.lax.optimization_barrier((p + 0.0 * f[0, 0],))
    return jnp.concatenate(feats, axis=-1)


def _uniform(table, pos, orient):
    n = pos.shape[0]
    px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]
    sc = jnp.asarray(scales)
    if orient == "LN":
        sc2 = sc[:, None]
        offs = (jnp.arange(L, dtype=jnp.int32) * S)[:, None]
        fx = px[None] * sc2 + 0.5
        fy = py[None] * sc2 + 0.5
        fz = pz[None] * sc2 + 0.5
    else:
        sc2 = sc[None, :]
        offs = (jnp.arange(L, dtype=jnp.int32) * S)[None, :]
        fx = px[:, None] * sc2 + 0.5
        fy = py[:, None] * sc2 + 0.5
        fz = pz[:, None] * sc2 + 0.5
    gx, gy, gz = jnp.floor(fx), jnp.floor(fy), jnp.floor(fz)
    wx1, wy1, wz1 = fx - gx, fy - gy, fz - gz
    ix, iy, iz = (g.astype(jnp.uint32) for g in (gx, gy, gz))
    flat = table.reshape(L * S, -1)
    acc = None
    for c in range(8):
        hx = (ix + np.uint32(c & 1)) * P0
        hy = (iy + np.uint32((c >> 1) & 1)) * P1
        hz = (iz + np.uint32((c >> 2) & 1)) * P2
        idx = ((hx ^ hy ^ hz) & MASK).astype(jnp.int32) + offs
        rows = jnp.take(flat, idx.reshape(-1), axis=0)
        w = ((wx1 if (c & 1) else 1.0 - wx1)
             * (wy1 if (c >> 1) & 1 else 1.0 - wy1)
             * (wz1 if (c >> 2) & 1 else 1.0 - wz1))
        if orient == "LN":
            term = rows.reshape(L, n, -1) * w[..., None]
        else:
            term = rows.reshape(n, L, -1) * w[..., None]
        acc = term if acc is None else acc + term
    if orient == "LN":
        return acc[..., :F].transpose(1, 0, 2).reshape(n, L * F)
    return acc[..., :F].reshape(n, L * F)


def enc_B(table, pos):
    return _uniform(table, pos, "LN")


def enc_C(table, pos):
    return _uniform(table, pos, "NL")


def timeit(fn, *args, n=6):
    r = fn(*args)
    _ = float(np.asarray(r).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _ = float(np.asarray(r).reshape(-1)[0])
    return (time.perf_counter() - t0) / n


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    table = hash_table_init(key, cfg)
    for N in (32768, 262144):
        pos = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))

        for name, enc in (("A per-level", enc_A), ("B uniform-LN", enc_B),
                          ("C uniform-NL", enc_C)):
            f = jax.jit(lambda t, p, e=enc: e(t, p).sum(axis=0))
            t0 = time.perf_counter()
            dt = timeit(f, table, pos)
            rate = N / dt / 1e6
            print(f"N={N} {name}: {dt*1000:7.2f} ms ({rate:6.1f} M samp/s)"
                  f" wall {time.perf_counter()-t0:.0f}s", flush=True)
        # chained x16 to simulate in-march repeated use
        for name, enc in (("A chain16", enc_A), ("C chain16", enc_C)):
            def chain(t, p, e=enc):
                for _ in range(16):
                    out = e(t, p)
                    p = p + 1e-12 * out[:1, :3].sum()
                    (p,) = jax.lax.optimization_barrier((p,))
                return out
            f = jax.jit(chain)
            t0 = time.perf_counter()
            dt = timeit(f, table, pos, n=3) / 16
            rate = N / dt / 1e6
            print(f"N={N} {name}: {dt*1000:7.2f} ms ({rate:6.1f} M samp/s)"
                  f" wall {time.perf_counter()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
