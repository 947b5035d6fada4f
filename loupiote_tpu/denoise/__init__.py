from .asvgf import (atrous_filter, atrous_iteration, demodulate, denoise,
                    modulate, temporal_reproject)

__all__ = ["atrous_filter", "atrous_iteration", "demodulate", "denoise",
           "modulate", "temporal_reproject"]
