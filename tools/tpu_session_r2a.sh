#!/bin/bash
# Round-2 TPU measurement batch A — run each step SEQUENTIALLY (the axon
# tunnel deadlocks with two TPU processes; CLAUDE.md).  Generous timeouts:
# first compiles through the tunnel take minutes and a killed compile
# saves nothing to the cache.
set -x
cd /root/repo

echo "=== 1/4 bench.py (headline fwd + fwdbwd) ==="
timeout 4000 python bench.py

echo "=== 2/4 ab_beam.py (beam prepass A/B, VERDICT #5) ==="
timeout 4000 python benches/ab_beam.py

echo "=== 3/4 ab_flyover.py (fly-over levers, VERDICT #7) ==="
timeout 6000 python benches/ab_flyover.py

echo "=== 4/4 device_workloads.py (reference workloads) ==="
timeout 4000 python benches/device_workloads.py

echo "=== TPU batch A done ==="
