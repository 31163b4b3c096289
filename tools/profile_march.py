"""March-pipeline profiler: where does the 720p NeRF frame time go?

Runs on the real TPU (axon). Measures, on the bench head scene:
  1. nerf-only frame at 720p: native_fast vs native_wide configs
  2. epoch/chunk counts of the compacting march (instrumented copy)
  3. monolithic one-epoch cost at full 921600-ray width
  4. network eval throughput (drained) for both configs
  5. advance-pass (skip-gather DDA) cost at chunk vs full width

Usage: python tools/profile_march.py [fast|wide|counts|mono|net|adv|all]
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, "assets", "cache")
jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

W, H = 1280, 720


def get_testbed(cfg_name):
    from bench import build_bench_snapshot, make_renderer
    from nerf_glasses_tpu.config import NGPConfig
    snap = os.path.join(CACHE, f"bench_head_{cfg_name}_prof.msgpack")
    if not os.path.exists(snap):
        cfg = (NGPConfig.native_wide() if cfg_name == "wide"
               else NGPConfig.native_fast())
        build_bench_snapshot(snap, cfg)
    # the bench's own camera (orbit + zoom: head fills a realistic share)
    renderer, tb = make_renderer(snap)
    return tb


def timeit(fn, n=6, warmup=2):
    for i in range(warmup):
        r = fn(i)
    jax.block_until_ready(r)
    _ = float(np.asarray(r).reshape(-1)[0])
    t0 = time.perf_counter()
    for i in range(n):
        r = fn(warmup + i)
    _ = float(np.asarray(r).reshape(-1)[0])
    return (time.perf_counter() - t0) / n


def frame_time(tb, label):
    from nerf_glasses_tpu.ops import raymarch

    opts = tb._march_options()
    scene = tb._scene()
    cam = tb.camera_matrix

    def one(i):
        rgba, _ = raymarch.render_image_device(
            tb.params, scene, cam, W, H, opts, sample_index=i)
        return rgba
    t0 = time.perf_counter()
    dt = timeit(one)
    print(f"{label}: {dt*1000:.1f} ms/frame  (wall incl compile "
          f"{time.perf_counter()-t0:.0f}s)", flush=True)
    return dt


def counts(tb):
    """Instrumented compacting march: epochs run + chunk-iterations."""
    from nerf_glasses_tpu.ops import raymarch as rm

    opts = tb._march_options()
    scene = tb._scene()
    cam = tb.camera_matrix
    o, d = rm.camera_rays(np.asarray(cam), W, H)
    npix = o.shape[0]
    CH = opts.chunk
    pad = (-npix) % CH
    if pad:
        o = np.concatenate([o, np.broadcast_to(o[-1], (pad, 3))])
        d = np.concatenate([d, np.broadcast_to(d[-1], (pad, 3))])
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    n = o.shape[0]
    surf = jnp.zeros((n, 4))
    tsurf = jnp.zeros((n,))

    from functools import partial

    @partial(jax.jit, static_argnames=("opts",))
    def instrumented(params, scene, o, d, surf, tsurf, opts):
        st = rm._make_state(scene, o, d, surf, tsurf, opts, 0)
        ids = jnp.arange(n, dtype=jnp.int32)
        epoch_rounds = opts.rounds_per_epoch
        max_epochs = max(1, opts.max_rounds // epoch_rounds)
        MAXREC = 64

        def outer_cond(c):
            st, epoch, nchunks, alive_hist = c
            return jnp.any(st["alive"]) & (epoch < max_epochs)

        def outer_body(c):
            st, epoch, nchunks, alive_hist = c
            alive = st["alive"]
            n_alive = jnp.sum(alive.astype(jnp.int32))
            alive_hist = alive_hist.at[jnp.minimum(epoch, MAXREC - 1)].set(
                n_alive)
            pos_alive = jnp.cumsum(alive.astype(jnp.int32)) - 1
            pos_dead = n_alive + jnp.cumsum((~alive).astype(jnp.int32)) - 1
            slot = jnp.where(alive, pos_alive, pos_dead)
            perm = jnp.zeros((n,), jnp.int32).at[slot].set(ids)
            n_chunks = (n_alive + CH - 1) // CH

            def chunk_body(i, st):
                idx = jax.lax.dynamic_slice(perm, (i * CH,), (CH,))
                sub = {k: st[k][idx] for k in rm._MUTABLE + rm._CONST}
                sub = rm._advance_pass(sub, scene, opts, opts.advance_iters)

                def round_body(_, sub):
                    return rm._march_round(sub, params, scene, opts)
                sub = jax.lax.fori_loop(0, epoch_rounds, round_body, sub)
                for k in rm._MUTABLE:
                    st[k] = st[k].at[idx].set(sub[k])
                return st

            st = jax.lax.fori_loop(0, n_chunks, chunk_body, st)
            return st, epoch + 1, nchunks + n_chunks, alive_hist

        init = (st, jnp.int32(0), jnp.int32(0),
                jnp.zeros((MAXREC,), jnp.int32))
        _, epochs, nchunks, alive_hist = jax.lax.while_loop(
            outer_cond, outer_body, init)
        return epochs, nchunks, alive_hist

    t0 = time.perf_counter()
    e, nc, ah = instrumented(tb.params, scene, o, d, surf, tsurf, opts)
    e, nc = int(e), int(nc)
    ah = np.asarray(ah)
    print(f"epochs={e} chunk_iters={nc} (compile+run "
          f"{time.perf_counter()-t0:.0f}s)")
    print("alive per epoch:", ah[:min(e, 64)].tolist(), flush=True)


def mono(tb):
    """One full-width epoch: advance_pass + one K-sample round on all
    921600 rays in one op (no chunking)."""
    from nerf_glasses_tpu.ops import raymarch as rm
    opts = tb._march_options()
    scene = tb._scene()
    cam = tb.camera_matrix
    o, d = rm.camera_rays(np.asarray(cam), W, H)
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    n = o.shape[0]
    surf = jnp.zeros((n, 4))
    tsurf = jnp.zeros((n,))
    from functools import partial

    @partial(jax.jit, static_argnames=("opts",))
    def one_epoch(params, scene, o, d, surf, tsurf, opts, si):
        st = rm._make_state(scene, o, d, surf, tsurf, opts, si)
        st = rm._advance_pass(st, scene, opts, opts.advance_iters)
        st = rm._march_round(st, params, scene, opts)
        return st["rgba"]

    def one(i):
        return one_epoch(tb.params, scene, o, d, surf, tsurf, opts, i)
    t0 = time.perf_counter()
    dt = timeit(one)
    print(f"monolithic epoch (advance48 + 1 round, {n} rays): "
          f"{dt*1000:.1f} ms  (wall {time.perf_counter()-t0:.0f}s)",
          flush=True)

    @partial(jax.jit, static_argnames=("opts",))
    def adv_only(params, scene, o, d, surf, tsurf, opts, si):
        st = rm._make_state(scene, o, d, surf, tsurf, opts, si)
        st = rm._advance_pass(st, scene, opts, opts.advance_iters)
        return st["t"]

    def one2(i):
        return adv_only(tb.params, scene, o, d, surf, tsurf, opts, i)
    t0 = time.perf_counter()
    dt2 = timeit(one2)
    print(f"  of which init+advance48: {dt2*1000:.1f} ms "
          f"(wall {time.perf_counter()-t0:.0f}s)", flush=True)


def net(tb, label):
    from nerf_glasses_tpu.ops.network import apply_network
    cfg = tb.config
    for nsamp in (32768, 1048576):
        key = jax.random.PRNGKey(0)
        pos = jax.random.uniform(key, (nsamp, 3), minval=0.3, maxval=0.7)
        dirs = jnp.full((nsamp, 3), 0.57735)

        @jax.jit
        def f(pos):
            rgb, sig = apply_network(tb.params, pos, dirs, cfg,
                                     compute_dtype=jnp.bfloat16)
            return pos + 1e-12 * (rgb.sum() + sig.sum()), rgb

        def one(i, pos=pos):
            p = pos
            for _ in range(8):
                p, rgb = f(p)
            return rgb
        t0 = time.perf_counter()
        dt = timeit(one, n=4) / 8
        rate = nsamp / dt / 1e6
        print(f"{label} network {nsamp} samples: {dt*1000:.2f} ms "
              f"({rate:.1f} M samples/s) (wall {time.perf_counter()-t0:.0f}s)",
              flush=True)


def adv(tb):
    from nerf_glasses_tpu.ops import raymarch as rm
    opts = tb._march_options()
    scene = tb._scene()
    cam = tb.camera_matrix
    o_full, d_full = rm.camera_rays(np.asarray(cam), W, H)
    from functools import partial

    @partial(jax.jit, static_argnames=("opts", "iters"))
    def adv_pass(scene, o, d, opts, iters, si):
        n = o.shape[0]
        st = rm._make_state(scene, o, d, jnp.zeros((n, 4)), jnp.zeros((n,)),
                            opts, si)
        st = rm._advance_pass(st, scene, opts, iters)
        return st["t"]

    for nb in (4096, 921600):
        o = jnp.asarray(o_full[:nb])
        d = jnp.asarray(d_full[:nb])

        def one(i):
            return adv_pass(scene, o, d, opts, 48, i)
        t0 = time.perf_counter()
        dt = timeit(one)
        print(f"advance48 on {nb} rays: {dt*1000:.2f} ms "
              f"(wall {time.perf_counter()-t0:.0f}s)", flush=True)


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}", flush=True)
    tb_fast = get_testbed("fast")
    if what in ("fast", "all"):
        frame_time(tb_fast, "native_fast 720p nerf-only")
    if what in ("wide", "all"):
        tb_wide = get_testbed("wide")
        frame_time(tb_wide, "native_wide 720p nerf-only")
    if what in ("counts", "all"):
        counts(tb_fast)
    if what in ("mono", "all"):
        mono(tb_fast)
    if what in ("net", "all"):
        net(tb_fast, "native_fast")
        if what == "all":
            net(get_testbed("wide"), "native_wide")
    if what in ("adv", "all"):
        adv(tb_fast)


if __name__ == "__main__":
    main()
