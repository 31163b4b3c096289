"""Multi-chip scaling: shard_map over a jax.sharding.Mesh.

The reference is a single-GPU, single-stream renderer (SURVEY.md §2.9);
its TPU-native scaling story is pure data parallelism over the ray/pixel
dimension riding ICI:

- rendering: rays are sharded across chips; the NeRF parameters,
  occupancy grid, and scene constants are replicated (tens of MB — they
  fit per-chip). There are no cross-ray dependencies, so the march needs
  no collectives; each chip's tile exits its while_loop independently
  (the multi-chip analogue of ray compaction). Final image assembly is
  the only gather.
- training: the ray batch is sharded; per-chip gradients are psum'd over
  ICI before a replicated Adam step (gradients ~ parameter-sized, one
  all-reduce per step).

No DCN is needed at one-slice scale. Tensor/pipeline parallelism are
intentionally absent: the whole MLP stack is ~50k weights (it lives in
VMEM), and the march is latency-bound per ray, so sharding anything but
rays only adds collectives (SURVEY.md §2.9's TPU-native equivalent).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerf_glasses_tpu.ops import raymarch
from nerf_glasses_tpu.train import trainer as trainer_mod


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


# ---------------------------------------------------------------------------
# Sharded rendering
# ---------------------------------------------------------------------------

def make_sharded_march(mesh: Mesh, opts: raymarch.MarchOptions,
                       axis: str = "data", use_frame_marcher: bool = True):
    """-> fn(params, scene, o, d, surface_rgba, t_surface) with rays
    sharded over `axis`; params/scene replicated. Each chip runs its own
    compacting march_frame loop (per-chip early exit; no collectives)."""

    def local(params, scene, o, d, surface_rgba, t_surface):
        n_local = o.shape[0]
        local_opts = opts
        if use_frame_marcher and n_local % opts.chunk == 0:
            out = raymarch.march_frame(params, scene, o, d, surface_rgba,
                                       t_surface, local_opts)
        else:
            out = raymarch.march_rays(params, scene, o, d, surface_rgba,
                                      t_surface, local_opts)
        return out["rgba"], out["depth"]

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(fn)


def render_image_sharded(params, scene, camera, width, height,
                         opts: raymarch.MarchOptions, mesh: Mesh,
                         surface_rgba=None, t_surface=None):
    """Full-frame render with rays sharded across the mesh devices."""
    o, d = raymarch.camera_rays(camera, width, height)
    npix = o.shape[0]
    n_dev = mesh.devices.size
    pad = (-npix) % n_dev
    if surface_rgba is None:
        surface_rgba = np.zeros((npix, 4), np.float32)
        t_surface = np.zeros((npix,), np.float32)
    if pad:
        o = np.concatenate([o, np.repeat(o[-1:], pad, 0)])
        d = np.concatenate([d, np.repeat(d[-1:], pad, 0)])
        surface_rgba = np.concatenate(
            [surface_rgba, np.zeros((pad, 4), np.float32)])
        t_surface = np.concatenate([t_surface, np.zeros(pad, np.float32)])

    fn = make_sharded_march(mesh, opts)
    with mesh:
        rgba, depth = fn(params, scene, jnp.asarray(o), jnp.asarray(d),
                         jnp.asarray(surface_rgba), jnp.asarray(t_surface))
    rgba = np.asarray(rgba)[:npix].reshape(height, width, 4)
    depth = np.asarray(depth)[:npix].reshape(height, width)
    return rgba, depth


# ---------------------------------------------------------------------------
# Sharded HYBRID frame: mesh pass + flash coarse init + compacting march,
# all inside shard_map (the executable path behind the bench's x8
# extrapolation — each chip renders its rows of the frame end to end;
# params/scene/geometry replicated, zero collectives).
# ---------------------------------------------------------------------------

_HYBRID_FN_CACHE = {}


def make_hybrid_frame_sharded(mesh: Mesh, tri_mesh, opts,
                              width: int, height: int, axis: str = "data",
                              supersample: int = 2):
    """-> fn(params, scene, xforms, nrm_mats, cam, light, pix_offset)
    rendering the full hybrid frame with pixel ROWS sharded over `axis`.

    Per shard (= per chip): the mesh pass traces+shades its rows at
    `supersample` resolution, block-reduces them into surface payloads
    (copyRaytracingBuffersToNerfRays semantics), and the compacting
    march (march_frame_impl, including the flash coarse init when
    opts.lowres_factor > 1) runs on the shard's rays with device-side
    ray generation. The flash coarse pass is computed replicated over
    the whole low-res grid (negligible: (H/F)*(W/F) rays) so its 3x3
    min-filter sees no shard seams and the result is identical to the
    single-device frame.

    Geometry (tri_mesh: ops.triangles.MeshArrays) is closed over as
    constants; instance transforms are runtime args. Jitter uses
    shard-local ray ids; pass opts.jitter=False for bitwise
    shard-count-invariance (the equivalence tests do).
    """
    import dataclasses as _dc

    from nerf_glasses_tpu.ops import triangles as tri_ops
    from nerf_glasses_tpu.ops.colors import linear_to_srgb
    from nerf_glasses_tpu.ops.raymarch import _shade_frame, march_frame_impl

    n_dev = mesh.devices.size
    assert height % n_dev == 0, (height, n_dev)
    rows = height // n_dev
    npix_local = rows * width
    if npix_local % opts.chunk != 0:
        # largest divisor of the shard's ray count <= the tuned chunk
        best = 1
        i = 1
        while i * i <= npix_local:
            if npix_local % i == 0:
                for c in (i, npix_local // i):
                    if c <= opts.chunk:
                        best = max(best, c)
            i += 1
        opts = _dc.replace(opts, chunk=best)
    f = supersample
    use_pallas = jax.default_backend() == "tpu"
    flash = opts.lowres_factor > 1

    def local(params, scene, xforms, nrm_mats, cam, light, pix_offset,
              t_floor_rows, alive_rows):
        row0 = jax.lax.axis_index(axis) * rows
        eye = cam[:, 3]

        # ---- mesh pass for my rows at supersample resolution ----
        hf, wf = rows * f, width * f
        px = jax.lax.broadcasted_iota(jnp.float32, (hf, wf), 1) + 0.5
        py = (jax.lax.broadcasted_iota(jnp.float32, (hf, wf), 0)
              + row0 * f + 0.5)
        ndc = jnp.stack([px / (width * f) * 2.0 - 1.0,
                         py / (height * f) * 2.0 - 1.0,
                         jnp.ones((hf, wf))], axis=-1)
        d_m = (ndc @ cam[:, :3].T).reshape(-1, 3)
        d_m = d_m / jnp.linalg.norm(d_m, axis=-1, keepdims=True)
        o_m = jnp.broadcast_to(eye, d_m.shape)

        rot = xforms[tri_mesh.inst_id, :, :3]
        trans = xforms[tri_mesh.inst_id, :, 3]
        v0 = jnp.einsum("tij,tj->ti", rot, tri_mesh.v0) + trans
        e1 = jnp.einsum("tij,tj->ti", rot, tri_mesh.e1)
        e2 = jnp.einsum("tij,tj->ti", rot, tri_mesh.e2)
        if use_pallas:
            from nerf_glasses_tpu.ops.mesh_pallas import (BLOCK,
                                                          raycast_pallas)
            tri_scalars = jnp.concatenate([v0, e1, e2], axis=1)
            pad = (-o_m.shape[0]) % BLOCK
            o_p = jnp.pad(o_m, ((0, pad), (0, 0)), mode="edge")
            d_p = jnp.pad(d_m, ((0, pad), (0, 0)), mode="edge")
            t, tri, uu, vv = raycast_pallas(tri_scalars, o_p, d_p,
                                            tri_mesh.n_tris)
            t, tri = t[:hf * wf], tri[:hf * wf]
            uv = jnp.stack([uu[:hf * wf], vv[:hf * wf]], axis=-1)
        else:
            t, tri, uv = tri_ops._raycast_chunked(
                o_m, d_m, v0, e1, e2, chunk=256, cull_backfaces=True)
        rgb = tri_ops.shade_hits_compacted(tri_mesh, o_m, d_m, t, tri, uv,
                                           nrm_mats, light, eye)
        hit = tri >= 0
        rgb = linear_to_srgb(jnp.clip(rgb, 0.0, 1.0))
        color = jnp.concatenate([rgb, hit[:, None].astype(jnp.float32)],
                                -1).reshape(hf, wf, 4)
        depth = jnp.where(hit, t, 0.0).reshape(hf, wf)
        surf_c, surf_t = tri_ops.downsample_surface(color, depth, f)

        # ---- volumetric march on my rows ----
        def chunk_raygen(idx):
            gid = idx + row0 * width
            fx = (jnp.remainder(gid, width).astype(jnp.float32)
                  + pix_offset[0]) / width * 2.0 - 1.0
            fy = ((gid // width).astype(jnp.float32)
                  + pix_offset[1]) / height * 2.0 - 1.0
            ndc_c = jnp.stack([fx, fy, jnp.ones_like(fx)], axis=-1)
            dc = ndc_c @ cam[:, :3].T
            dc = dc / jnp.linalg.norm(dc, axis=-1, keepdims=True)
            oc = jnp.broadcast_to(cam[:, 3] + 0.5, dc.shape)
            return oc, dc

        o, d = chunk_raygen(jnp.arange(npix_local, dtype=jnp.int32))
        out = march_frame_impl(
            params, scene, o, d, surf_c.reshape(-1, 4),
            surf_t.reshape(-1), opts, chunk_raygen=chunk_raygen,
            has_surface=True,
            t_floor=(t_floor_rows.reshape(-1) if flash else None),
            alive_mask=(alive_rows.reshape(-1) if flash else None))
        rgba = out["rgba"].reshape(rows, width, 4)
        depth_out = out["depth"].reshape(rows, width)
        return _shade_frame(rgba, False), depth_out

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )

    def full(params, scene, xforms, nrm_mats, cam, light, pix_offset):
        if flash:
            # replicated flash coarse init over the whole frame
            # (seam-free; voxel-splat when scene carries occ_pts)
            from nerf_glasses_tpu.ops.raymarch import (flash_init,
                                                       upsample_flash_init)
            tmin, alive_img = flash_init(scene, cam, width, height, opts)
            t_up, a_up = upsample_flash_init(tmin, alive_img, width,
                                             height, opts.lowres_factor)
            t_up = t_up.reshape(height, width)
            a_up = a_up.reshape(height, width)
        else:
            t_up = jnp.zeros((height, width))
            a_up = jnp.zeros((height, width), bool)
        return sharded(params, scene, xforms, nrm_mats, cam, light,
                       pix_offset, t_up, a_up)

    return jax.jit(full)


def render_hybrid_sharded(params, scene, tri_mesh, xforms, nrm_mats,
                          camera, width: int, height: int, opts,
                          mesh: Mesh, light_pos=(1.0, 1.0, 1.0),
                          pix_offset=(0.5, 0.5)):
    """Full hybrid frame (mesh pass + flash init + march) with rows
    sharded across the device mesh -> (frame (H,W,4) linear
    premultiplied, depth (H,W)) numpy."""
    key = (tri_mesh.version, opts, width, height, mesh.devices.size)
    fn = _HYBRID_FN_CACHE.get(key)
    if fn is None:
        fn = make_hybrid_frame_sharded(mesh, tri_mesh, opts, width, height)
        _HYBRID_FN_CACHE[key] = fn
    with mesh:
        rgba, depth = fn(params, scene, jnp.asarray(xforms),
                         jnp.asarray(nrm_mats),
                         jnp.asarray(camera, jnp.float32),
                         jnp.asarray(light_pos, jnp.float32),
                         jnp.asarray(pix_offset, jnp.float32))
    return np.asarray(rgba), np.asarray(depth)


# ---------------------------------------------------------------------------
# Sharded training (DP over the ray batch, psum grads)
# ---------------------------------------------------------------------------

def _make_local_step(mesh: Mesh, opts: trainer_mod.TrainOptions,
                     axis: str = "data"):
    """One data-parallel training step as a shard_map-local function
    (state/data replicated; each chip samples its own rays; grads/loss
    pmean'd over ICI)."""
    n_dev = mesh.devices.size
    local_rays = opts.rays_per_batch // n_dev
    assert local_rays * n_dev == opts.rays_per_batch

    import dataclasses
    local_opts = dataclasses.replace(opts, rays_per_batch=local_rays)

    def local_step(state, data):
        # fold the device index into the rng so each chip samples
        # different rays
        idx = jax.lax.axis_index(axis)
        rng = jax.random.fold_in(state["rng"], idx)
        rng, r1, r2, r3 = jax.random.split(rng, 4)
        img, px, py, target, samples = trainer_mod._ray_batch(
            state, data, r1, r2, local_rays, local_opts)
        if opts.random_bg and not opts.train_envmap:
            bg = jax.random.uniform(r3, (local_rays, 3))
        else:
            bg = jnp.ones((local_rays, 3))
        (loss, per_ray_err), (grads, aux_grads) = trainer_mod._loss_and_grads(
            state, data, img, px, py, target, samples, bg, local_opts)
        # all-reduce: mean over chips (each chip's loss is a mean over its
        # local rays, so the mean of means is the global mean)
        loss = jax.lax.pmean(loss, axis)
        grads = jax.lax.pmean(grads, axis)
        aux_grads = jax.lax.pmean(aux_grads, axis)

        new_params, new_opt = trainer_mod.adam_update(
            state["params"], grads, state["opt"], state["step"], opts)
        new_aux, new_aux_opt = trainer_mod._aux_adam_update(
            state["aux"], aux_grads, state["aux_opt"], state["step"], opts)
        new_rng = jax.random.split(state["rng"], 2)[0]
        ema = jnp.where(state["step"] == 0, loss,
                        0.99 * state["loss_ema"] + 0.01 * loss)
        out = {**state, "params": new_params, "opt": new_opt,
               "aux": new_aux, "aux_opt": new_aux_opt,
               "step": state["step"] + 1, "rng": new_rng,
               "loss_ema": ema}
        if "error_map" in state:
            # psum the per-chip error rasters so the replicated map stays
            # identical on every chip
            h, w = data["images"].shape[1:3]
            sum_g, cnt_g = trainer_mod._error_map_accum(
                state["error_map"], img, px, py, per_ray_err, w, h)
            sum_g = jax.lax.psum(sum_g, axis)
            cnt_g = jax.lax.psum(cnt_g, axis)
            out["error_map"] = trainer_mod._error_map_apply(
                state["error_map"], sum_g, cnt_g, opts.error_map_beta)
        return out, loss

    return local_step


def make_sharded_train_step(mesh: Mesh, opts: trainer_mod.TrainOptions,
                            axis: str = "data"):
    """-> fn(state, data) -> (state, loss). The per-chip batch is
    opts.rays_per_batch // n_devices; gradients are psum'd over ICI."""
    fn = jax.shard_map(
        _make_local_step(mesh, opts, axis), mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_train_chunk(mesh: Mesh, opts: trainer_mod.TrainOptions,
                             axis: str = "data"):
    """-> fn(state, data, n_steps, update_grid, rebuild_occ) ->
    (state, losses (n_steps,)): the multi-chip analogue of
    trainer.train_chunk. The periodic density-grid update runs fused at
    the top (replicated — every chip computes the identical update from
    the replicated state/rng), then `n_steps` DP steps scan INSIDE one
    shard_map: no host sync anywhere in the chunk (the round-3
    ShardedTrainer fetched float(loss) every step, serializing real
    multi-chip hardware on the host round trip — SURVEY §2.9's
    psum-per-step design with a host sync in the middle defeats it)."""
    local_step = _make_local_step(mesh, opts, axis)

    def local_chunk(state, data, n_steps):
        def body(st, _):
            return local_step(st, data)

        return jax.lax.scan(body, state, None, length=n_steps)

    @partial(jax.jit, static_argnames=("n_steps", "update_grid",
                                       "rebuild_occ"), donate_argnums=(0,))
    def chunk(state, data, n_steps: int, update_grid: bool,
              rebuild_occ: bool):
        if update_grid:
            state = trainer_mod._update_density_grid_body(
                state, opts, rebuild_occ)
        fn = jax.shard_map(
            partial(local_chunk, n_steps=n_steps), mesh=mesh,
            in_specs=(P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(state, data)

    return chunk


class ShardedTrainer(trainer_mod.Trainer):
    """Trainer with the ray batch data-parallel over a device mesh.

    Steps dispatch in grid-cadence chunks (make_sharded_train_chunk):
    the density-grid update + up to grid_update_interval DP steps run as
    ONE device program with a single loss fetch at the end — the same
    no-per-step-host-sync discipline as the single-chip Trainer.train."""

    def __init__(self, dataset, opts=None, seed: int = 1337,
                 mesh: Optional[Mesh] = None):
        super().__init__(dataset, opts, seed)
        self.mesh = mesh if mesh is not None else make_mesh()
        self._step_fn = make_sharded_train_step(self.mesh, self.opts)
        self._chunk_fn = make_sharded_train_chunk(self.mesh, self.opts)
        # Trainer._chunk_opts warmup gating (compaction forced off while
        # the occupancy grid is dense): the sharded step/chunk bake opts
        # into their closures, so build the warmup variants explicitly —
        # same "two compiled variants total" rule as the single-chip path
        warm = self._chunk_opts(0)
        if warm is not self.opts:
            self._step_fn_warmup = make_sharded_train_step(self.mesh, warm)
            self._chunk_fn_warmup = make_sharded_train_chunk(self.mesh,
                                                             warm)
        else:
            self._step_fn_warmup = self._step_fn
            self._chunk_fn_warmup = self._chunk_fn
        # replicate state + data across the mesh
        rep = NamedSharding(self.mesh, P())
        self.state = jax.device_put(self.state, rep)
        self.data = jax.device_put(self.data, rep)

    def _fns_for(self, step: int):
        """(chunk_fn, step_fn) honoring the compaction warmup gate."""
        if self._chunk_opts(step) is not self.opts:
            return self._chunk_fn_warmup, self._step_fn_warmup
        return self._chunk_fn, self._step_fn

    def train(self, n_steps: int = 1, callback=None) -> float:
        if not hasattr(self, "loss_history"):
            self.loss_history = []
        interval = self.opts.grid_update_interval
        loss_chunks = []
        remaining = n_steps
        while remaining > 0:
            step = self._host_step
            update = step % interval == 0
            n = min(interval - step % interval, remaining)
            rebuild = step >= self.occ_warmup_steps
            chunk_fn, step_fn = self._fns_for(step)
            if callback is None:
                with self.mesh:
                    self.state, losses = chunk_fn(
                        self.state, self.data, n, update, rebuild)
                loss_chunks.append(losses)
            else:
                if update:
                    self.state = trainer_mod.update_density_grid(
                        self.state, self.opts, rebuild_occ=rebuild)
                for i in range(n):
                    self.state, loss = step_fn(self.state, self.data)
                    lf = float(loss)
                    callback(step + i + 1, lf)
                    loss_chunks.append(jnp.full((1,), lf))
            self._host_step += n
            remaining -= n
        all_losses = np.asarray(jnp.concatenate(loss_chunks), np.float32)
        self.loss = float(all_losses[-1])
        self.loss_history.extend(float(l) for l in all_losses)
        if len(self.loss_history) > self.loss_history_capacity:
            del self.loss_history[:-self.loss_history_capacity]
        return self.loss
