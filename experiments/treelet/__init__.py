"""Archived two-phase per-lane treelet pipeline (CLOSED by measurement).

Round-4 device A/B (artifacts/r4_device/treelet_sort.log): with XLA sort
at its uncontended ~12 ns/elem the full pipeline still loses to the wide
sub-packet kernel — diffuse 0.87x, shadow 0.29x (100% agreement) — the
cost is the phase-2 per-lane walk itself, not the regroup glue. The
counting-scatter regroup kernel (regroup.py) is additionally blocked by a
structural Mosaic restriction (dynamic memref_slice offsets must be
tile-aligned). Demoted out of loupiote_tpu per VERDICT r3 #6.

Run the archived A/B:   LOUPIOTE_TREELET=1 python experiments/treelet_bench.py
Run the archived tests: python -m pytest experiments/treelet/tests -q
"""

from .build import build_treelets  # noqa: F401
from .pipeline import (build_treelet_device, treelet_intersect,  # noqa: F401
                       treelet_occluded)
