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
# Sharded training (DP over the ray batch, psum grads)
# ---------------------------------------------------------------------------

def make_sharded_train_step(mesh: Mesh, opts: trainer_mod.TrainOptions,
                            axis: str = "data"):
    """-> fn(state, data) -> (state, loss). The per-chip batch is
    opts.rays_per_batch // n_devices; gradients are psum'd over ICI."""
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

    fn = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


class ShardedTrainer(trainer_mod.Trainer):
    """Trainer with the ray batch data-parallel over a device mesh."""

    def __init__(self, dataset, opts=None, seed: int = 1337,
                 mesh: Optional[Mesh] = None):
        super().__init__(dataset, opts, seed)
        self.mesh = mesh if mesh is not None else make_mesh()
        self._step_fn = make_sharded_train_step(self.mesh, self.opts)
        # replicate state + data across the mesh
        rep = NamedSharding(self.mesh, P())
        self.state = jax.device_put(self.state, rep)
        self.data = jax.device_put(self.data, rep)

    def train(self, n_steps: int = 1, callback=None) -> float:
        if not hasattr(self, "loss_history"):
            self.loss_history = []
        for _ in range(n_steps):
            if self.step % self.opts.grid_update_interval == 0:
                self.state = trainer_mod.update_density_grid(
                    self.state, self.opts,
                    rebuild_occ=self.step >= self.occ_warmup_steps)
            self.state, loss = self._step_fn(self.state, self.data)
            self.loss = float(loss)
            self.loss_history.append(self.loss)
            if len(self.loss_history) > self.loss_history_capacity:
                del self.loss_history[:-self.loss_history_capacity]
            if callback is not None:
                callback(self.step, self.loss)
        return self.loss
