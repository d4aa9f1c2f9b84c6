"""Pallas TPU kernels for hot ops.

The traversal loop itself currently lives in XLA (see PERF.md for why —
Mosaic lacks the wide vector gather it needs); these kernels cover ops where
Pallas already wins: MXU-based palette lookups fused with shading.
"""

from voxelhex_tpu.ops.shade_pallas import pallas_shade, shade_reference

__all__ = ["pallas_shade", "shade_reference"]
