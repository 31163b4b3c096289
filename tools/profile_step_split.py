"""Attribute the training step's per-sample cost on the real TPU.

profile_train.py established the step is LINEAR in batch (2048->4096
rays doubles 150->299 ms) with march/grid-update/error-map all noise —
so the cost is the per-sample network work. This probe times the
pieces in isolation on the default batch shape (2048 rays x 48
samples = 98304 positions):

  encode_fwd    hash_encode fwd only
  density_fwd   hash encode + density MLP fwd
  network_fwd   full network fwd (encode + density + SH + color)
  network_vjp   fwd + full backward (the train step's grad path)
  adam          optimizer update alone on the param pytree
  step          the real train_chunk step (reference)

The split decides where a 2x steps/s must come from (VERDICT r4 #3
asks >=12-16 steps/s; the compaction lever measured +15% because its
live-network T estimate re-pays the full-batch density forward).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/assets/cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench_scene
from nerf_glasses_tpu.config import NGPConfig
from nerf_glasses_tpu.ops.hashgrid import hash_encode
from nerf_glasses_tpu.ops.network import apply_network, density_raw
from nerf_glasses_tpu.train.trainer import TrainOptions, Trainer, adam_update

N = 2048 * 48


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1000.0


def main():
    ds = bench_scene.build_capture_dataset()
    opts = TrainOptions(config=NGPConfig.native_fast())
    cfg = opts.config
    tr = Trainer(ds, opts, seed=3)
    tr.load_snapshot(bench_scene.get_trained_snapshot(
        "/root/repo/assets/cache"))
    params = tr.state["params"]
    cd = opts.cdtype

    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (N, 3), minval=0.2, maxval=0.8)
    dirs = jax.random.uniform(key, (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dir01 = (dirs + 1.0) * 0.5

    r = {}
    enc = jax.jit(lambda p, x: hash_encode(p["grid"], x, cfg,
                                           compute_dtype=cd))
    r["encode_fwd"] = timeit(enc, params, pos)

    dens = jax.jit(lambda p, x: density_raw(p, x, cfg, compute_dtype=cd))
    r["density_fwd"] = timeit(dens, params, pos)

    net = jax.jit(lambda p, x, d: apply_network(p, x, d, cfg,
                                                compute_dtype=cd))
    r["network_fwd"] = timeit(net, params, pos, dir01)

    def loss_fn(p, x, d):
        rgb, sig = apply_network(p, x, d, cfg, compute_dtype=cd)
        return jnp.mean(rgb.astype(jnp.float32) ** 2) + \
            jnp.mean(sig.astype(jnp.float32) ** 2)
    vjp = jax.jit(jax.grad(loss_fn))
    r["network_vjp"] = timeit(vjp, params, pos, dir01)

    grads = vjp(params, pos, dir01)
    ad = jax.jit(lambda p, g, o: adam_update(p, g, o, 100, opts),
                 static_argnums=())
    try:
        r["adam"] = timeit(ad, params, grads, tr.state["opt"])
    except Exception as e:  # signature drift — report, don't die
        r["adam"] = f"skipped: {e}"

    t0 = time.perf_counter()
    tr.train(32)
    r["step_real_settled"] = (time.perf_counter() - t0) / 32 * 1000.0
    t0 = time.perf_counter()
    tr.train(64)
    r["step_real_settled"] = min(
        r["step_real_settled"],
        (time.perf_counter() - t0) / 64 * 1000.0)

    for k, v in r.items():
        print(f"  {k:20s} {v if isinstance(v, str) else round(v, 1)}",
              flush=True)


if __name__ == "__main__":
    main()
