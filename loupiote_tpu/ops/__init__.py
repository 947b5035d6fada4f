from . import env, intersect, raygen, sampling, shade, texture, tonemap

__all__ = ["env", "intersect", "raygen", "sampling", "shade", "texture", "tonemap"]
