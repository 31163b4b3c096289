"""Axis-aligned bounding box (host-side numpy + device helpers).

API mirrors the reference BoundingBox (src/ngp/bounding_box.cuh:22-173),
including the pynmr-exposed methods (python_api.cu:242-261).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class BoundingBox:
    def __init__(self, a=None, b=None):
        if a is None:
            self.min = np.full(3, np.inf, np.float32)
            self.max = np.full(3, -np.inf, np.float32)
        else:
            self.min = np.asarray(a, np.float32).copy()
            self.max = np.asarray(b, np.float32).copy()

    def __repr__(self):
        return f"BoundingBox(min={self.min.tolist()}, max={self.max.tolist()})"

    def copy(self) -> "BoundingBox":
        return BoundingBox(self.min, self.max)

    def is_empty(self) -> bool:
        return bool(np.any(self.max < self.min))

    def center(self):
        return 0.5 * (self.min + self.max)

    def diag(self):
        return self.max - self.min

    def relative_pos(self, pos):
        return (np.asarray(pos) - self.min) / self.diag()

    def enlarge(self, other):
        if isinstance(other, BoundingBox):
            self.min = np.minimum(self.min, other.min)
            self.max = np.maximum(self.max, other.max)
        else:
            p = np.asarray(other, np.float32)
            self.min = np.minimum(self.min, p)
            self.max = np.maximum(self.max, p)

    def inflate(self, amount: float):
        self.min = self.min - amount
        self.max = self.max + amount

    def intersection(self, other: "BoundingBox") -> "BoundingBox":
        out = BoundingBox(np.maximum(self.min, other.min),
                          np.minimum(self.max, other.max))
        return out

    def intersects(self, other: "BoundingBox") -> bool:
        return not self.intersection(other).is_empty()

    def contains(self, p) -> bool:
        p = np.asarray(p)
        return bool(np.all(p >= self.min) and np.all(p <= self.max))

    def ray_intersect(self, o, d):
        """Slab test -> (tmin, tmax); (FLT_MAX, FLT_MAX) on miss."""
        o = np.asarray(o, np.float64)
        d = np.asarray(d, np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            t0 = (self.min - o) / d
            t1 = (self.max - o) / d
        tmin = np.nanmax(np.minimum(t0, t1))
        tmax = np.nanmin(np.maximum(t0, t1))
        if tmin > tmax:
            fm = np.finfo(np.float32).max
            return np.array([fm, fm], np.float32)
        return np.array([tmin, tmax], np.float32)


def ray_intersect_aabb(o: jnp.ndarray, d: jnp.ndarray, box_min, box_max):
    """Vectorized slab test. o,d: (..., 3) -> (tmin, tmax) each (...,).

    Misses return (FLT_MAX, FLT_MAX) like BoundingBox::ray_intersect.
    """
    box_min = jnp.asarray(box_min, o.dtype)
    box_max = jnp.asarray(box_max, o.dtype)
    inv = 1.0 / d  # inf where d == 0, matching IEEE division in the reference
    t0 = (box_min - o) * inv
    t1 = (box_max - o) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    miss = tmin > tmax
    fm = jnp.float32(np.finfo(np.float32).max)
    return jnp.where(miss, fm, tmin), jnp.where(miss, fm, tmax)


def contains_aabb(p: jnp.ndarray, box_min, box_max) -> jnp.ndarray:
    box_min = jnp.asarray(box_min, p.dtype)
    box_max = jnp.asarray(box_max, p.dtype)
    return jnp.all((p >= box_min) & (p <= box_max), axis=-1)


def ray_intersect_aabb_soa(o3, d3, box_min, box_max):
    """Component-array slab test: o3/d3 are (ox,oy,oz)-style 3-tuples of
    (...,) arrays -> (tmin, tmax) each (...,). Misses return FLT_MAX."""
    box_min = jnp.asarray(box_min)
    box_max = jnp.asarray(box_max)
    tmin = tmax = None
    for axis, (o, d) in enumerate(zip(o3, d3)):
        inv = 1.0 / d
        t0 = (box_min[axis] - o) * inv
        t1 = (box_max[axis] - o) * inv
        lo = jnp.minimum(t0, t1)
        hi = jnp.maximum(t0, t1)
        tmin = lo if tmin is None else jnp.maximum(tmin, lo)
        tmax = hi if tmax is None else jnp.minimum(tmax, hi)
    miss = tmin > tmax
    fm = jnp.float32(np.finfo(np.float32).max)
    return jnp.where(miss, fm, tmin), jnp.where(miss, fm, tmax)


def contains_aabb_soa(p3, box_min, box_max) -> jnp.ndarray:
    """Component-array containment: p3 = (px,py,pz) of (...,) arrays."""
    box_min = jnp.asarray(box_min)
    box_max = jnp.asarray(box_max)
    out = None
    for axis, p in enumerate(p3):
        c = (p >= box_min[axis]) & (p <= box_max[axis])
        out = c if out is None else out & c
    return out
