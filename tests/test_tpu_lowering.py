"""AOT-lower every production Pallas kernel for the TPU target.

Interpret-mode tests validate kernel SEMANTICS but not Mosaic's ability
to lower the kernel for real TPU hardware — `jax.jit(f).trace(...)
.lower(lowering_platforms=("tpu",))` does, and it runs on CPU-only
machines. This gate exists because a fused flash-epoch kernel shipped
in round 3 passed all interpret-mode equivalence tests and then failed
Mosaic lowering outright (arbitrary-row `jnp.take` from a VMEM table:
Mosaic supports only same-shape `tpu.dynamic_gather` lane/sublane
shuffles — TPU has no vector gather; XLA's HBM gather is the fast
path, measured tools/profile_encode.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_glasses_tpu.ops import mesh_pallas as mp


def lowers_for_tpu(fn, *args):
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def test_mesh_raycast_lowers_for_tpu():
    tri = jnp.zeros((16, 9), jnp.float32)
    o = jnp.zeros((mp.BLOCK, 3), jnp.float32)
    d = jnp.ones((mp.BLOCK, 3), jnp.float32)
    lowers_for_tpu(lambda t, oo, dd: mp.raycast_pallas(t, oo, dd, n_tris=16),
                   tri, o, d)


def test_mesh_raycast_tiled_lowers_for_tpu():
    n_blocks = 2
    tri = jnp.zeros((16, 9), jnp.float32)
    o = jnp.zeros((n_blocks * mp.BLOCK, 3), jnp.float32)
    d = jnp.ones((n_blocks * mp.BLOCK, 3), jnp.float32)
    lists = jnp.zeros((n_blocks, 16), jnp.int32)
    counts = jnp.zeros((n_blocks,), jnp.int32)
    lowers_for_tpu(mp.raycast_pallas_tiled, tri, o, d, lists, counts)
