"""nerf_glasses_tpu — a TPU-native (JAX/XLA/Pallas) hybrid NeRF + mesh renderer.

A from-scratch re-design of the capabilities of arnerak/nerf-glasses
(CUDA/OptiX/tiny-cuda-nn) for TPU hardware:

- Instant-NGP hash-grid NeRF inference *and* training (JAX + Pallas kernels)
- glTF mesh ray-caster with PBR shading (pure XLA, replaces OptiX)
- depth-gated hybrid compositing (mesh surfaces occlude / are occluded by
  the volume at the correct depth)
- iNGP-compatible `.msgpack` snapshot load/save
- floaty removal (density-grid clustering)
- a `pynmr`-compatible Python API so the reference `volume/render.py`
  workflow runs unchanged.

Layout:
    ops/       pure functional compute kernels (hash grid, SH, MLP, march,
               composite, triangle ray-cast) — jnp reference + Pallas fast path
    models/    stateful user-facing objects (Testbed, NerfMeshRenderer)
    io/        snapshot (msgpack), glTF, NeRF dataset loaders
    train/     hash-grid NeRF training loop
    parallel/  multi-chip sharding (jax.sharding.Mesh + shard_map)
    utils/     cameras, quaternions, glasses-placement math
"""

__version__ = "0.1.0"

from nerf_glasses_tpu.config import NGPConfig  # noqa: F401
