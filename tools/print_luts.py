"""Print the generated spatial LUTs as literals, for inspection or for
embedding in other kernels (parity with the reference's LUT generator bins,
src/bin/sectant_region_offset_lut.rs and src/bin/sectant_step_result_lut.rs).

The framework itself never reads the printed output — the tables are
regenerated at import time by ``voxelhex_tpu.spatial.luts``; this tool only
renders them human-readable.

Usage:
    python tools/print_luts.py [offset|step|occupancy]
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from voxelhex_tpu.spatial.luts import (
    RAY_TO_NODE_OCCUPANCY_BITMASK_LUT,
    SECTANT_OFFSET_LUT,
    SECTANT_STEP_RESULT_LUT,
)


def print_offset():
    print("SECTANT_OFFSET_LUT = [  # [64][3] relative offsets, steps of 0.25")
    for s, off in enumerate(SECTANT_OFFSET_LUT):
        print(f"    ({off[0]:.2f}, {off[1]:.2f}, {off[2]:.2f}),  # sectant {s}")
    print("]")


def print_step():
    print("SECTANT_STEP_RESULT_LUT = [  # [64][3][3][3]; >=64 = out of node")
    for s in range(64):
        rows = []
        for dx in range(3):
            plane = [
                "[" + ", ".join(f"{SECTANT_STEP_RESULT_LUT[s, dx, dy, dz]:2d}" for dz in range(3)) + "]"
                for dy in range(3)
            ]
            rows.append("[" + ", ".join(plane) + "]")
        print(f"    [{', '.join(rows)}],  # sectant {s}")
    print("]")


def print_occupancy():
    print("RAY_TO_NODE_OCCUPANCY_BITMASK_LUT = [  # [64][8] u64 reach masks")
    for s in range(64):
        masks = ", ".join(
            f"0x{int(RAY_TO_NODE_OCCUPANCY_BITMASK_LUT[s, o]):016x}" for o in range(8)
        )
        print(f"    [{masks}],  # sectant {s}")
    print("]")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("offset", "all"):
        print_offset()
    if which in ("step", "all"):
        print_step()
    if which in ("occupancy", "all"):
        print_occupancy()


if __name__ == "__main__":
    main()
