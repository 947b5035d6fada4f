from .bvh import LEAF_MAX, FlatBVH, build_bvh, bvh_stats

__all__ = ["LEAF_MAX", "FlatBVH", "build_bvh", "bvh_stats"]
