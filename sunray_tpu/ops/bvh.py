"""LBVH build + traversal (the VK_KHR_acceleration_structure replacement).

Placeholder module boundary — filled in by the BVH milestone (SURVEY.md
section 7 M3): Morton-code sort, Karras linear topology, AABB refit, and a
stack-based traversal usable under vmap/jit, plus a Pallas kernel variant.
"""

from __future__ import annotations


class Bvh:  # pragma: no cover - placeholder
    pass


def build_bvh(tris, leaf_size: int = 4):  # pragma: no cover
    raise NotImplementedError("LBVH build lands in the BVH milestone")


def trace_closest_bvh(bvh, tris, orig, d, tmin, tmax):  # pragma: no cover
    raise NotImplementedError


def trace_occluded_bvh(bvh, tris, orig, d, tmax, tmin, exclude=None):  # pragma: no cover
    raise NotImplementedError
