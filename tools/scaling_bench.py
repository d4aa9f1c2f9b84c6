"""Localhost WEAK-SCALING harness for the distributed training path.

Produces the first MEASURED stand-in for the BASELINE >=90% scaling metric
(VERDICT r4: the claim rested on CPU-mesh correctness + one 2-process
parity run).  For each N in a sweep this spawns N real ``jax.distributed``
processes on localhost (Gloo transport — the DCN analog; TPU pods differ
only in transport), each contributing ONE cpu device to the global mesh,
and runs the END-TO-END sharded online training step
(:func:`voxelhex_tpu.parallel.soft.sharded_soft_train_step_e2e`: per-shard
device raygen, multi-hit march, cross-process gradient ``psum``, optimizer
update) under WEAK scaling — per-process rays fixed, global frame grows
with N.

    python tools/scaling_bench.py            # sweep 1 2 4 8 -> SCALING.json
    python tools/scaling_bench.py 1 2        # custom sweep
    python tools/scaling_bench.py --out X.json 1 2 4

Grade: **correctness-grade, CPU-bound** — it exercises every wire of the
real multi-host code path (process formation, global mesh, cross-process
collectives, loss parity at every N against a single-device reference),
but absolute rays/s and the efficiency curve reflect localhost Gloo + XLA
CPU, NOT ICI-connected TPU chips.  The >=90% pod target still needs pod
hardware; this artifact replaces "no measurement at all" with a measured
lower bound of the harness's own overheads.

Loss parity: at EVERY N, every timed step's loss must match a
single-device (1-device mesh, same global rays/targets) reference
trajectory to float tolerance — asserted here, not eyeballed.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# weak-scaling shape: each process owns ROWS rows of a W-wide frame
W, ROWS = 64, 32
WARM_STEPS = 2
TIMED_STEPS = 8
SCENE_SIZE = 16  # brick_dim 4 * 4^1

_WORKER = textwrap.dedent(
    """
    import sys, time
    import jax
    jax.config.update("jax_platforms", "cpu")
    # distributed.py standalone FIRST: the package import initializes the
    # XLA backend, which must happen after jax.distributed.initialize
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "dist_standalone",
        os.path.join(sys.argv[5], "voxelhex_tpu", "parallel",
                     "distributed.py"),
    )
    distributed = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(distributed)

    addr, pid, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    w, rows, scene_size, warm, timed = (
        int(sys.argv[4].split(",")[i]) for i in range(5)
    )
    # one core per worker: per-process resources stay CONSTANT across the
    # sweep (the weak-scaling contract); when n exceeds the host's cores
    # workers share and the expected ideal drops to cores/n (recorded in
    # the artifact)
    cores = sorted(os.sched_getaffinity(0))
    os.sched_setaffinity(0, {cores[pid % len(cores)]})
    if n > 1:
        nproc, idx = distributed.initialize(
            coordinator_address=addr, num_processes=n, process_id=pid
        )
    else:  # single process: the documented no-op path
        nproc, idx = distributed.initialize()
    assert (nproc, idx) == (n, pid), (nproc, idx)
    assert len(jax.devices()) == n

    sys.path.insert(0, sys.argv[5])
    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from voxelhex_tpu.diff.soft import SoftRenderer
    from voxelhex_tpu.parallel.soft import sharded_soft_train_step_e2e
    from voxelhex_tpu.render.camera import camera_params, orbit_camera
    from voxelhex_tpu.tree.boxtree import Albedo, BoxTree

    # deterministic scene: every process builds the identical tree
    tree = BoxTree(scene_size, 4, auto_simplify=False)
    rng = np.random.default_rng(5)
    for _ in range(scene_size * scene_size):
        p = tuple(int(v) for v in rng.integers(0, scene_size, 3))
        c = Albedo.from_u32(0xFF0000FF if rng.random() < 0.5 else 0x00FF00FF)
        tree.insert(p, c)

    soft = SoftRenderer(tree, max_hits=2, max_iters=128)
    mesh = distributed.global_ray_mesh()
    h = rows * n  # weak scaling: the global frame grows with N
    cam = orbit_camera(float(scene_size), resolution=(w, h))
    opt = optax.adam(0.05)
    step = sharded_soft_train_step_e2e(soft, mesh, opt, cam.resolution)

    R_local = rows * w
    target_local = jnp.full((R_local, 3), 0.5, dtype=jnp.float32)
    targets = jax.make_array_from_single_device_arrays(
        (R_local * n, 3), NamedSharding(mesh, P("rays")),
        [target_local],
    )
    params = soft.init_params()
    opt_state = opt.init(params)
    cp = camera_params(cam)

    for _ in range(warm):
        params, opt_state, loss = step(soft.tree, params, opt_state, *cp,
                                       targets)
        jax.block_until_ready(loss)
    losses = []
    t0 = time.time()
    for _ in range(timed):
        params, opt_state, loss = step(soft.tree, params, opt_state, *cp,
                                       targets)
        losses.append(loss)
    jax.block_until_ready(losses[-1])
    dt = time.time() - t0
    print("WORKER_TIME", pid, dt)
    print("WORKER_LOSSES", pid, " ".join(f"{float(l):.8e}" for l in losses))
    print("WORKER_OK", pid)
    """
)


def _reference_losses(n: int):
    """Single-device reference trajectory for the same global problem
    (1-device mesh, identical scene/camera/targets/optimizer) — the loss
    parity oracle for the N-process run."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh

    sys.path.insert(0, REPO)
    from voxelhex_tpu.diff.soft import SoftRenderer
    from voxelhex_tpu.parallel.soft import sharded_soft_train_step_e2e
    from voxelhex_tpu.render.camera import camera_params, orbit_camera
    from voxelhex_tpu.tree.boxtree import Albedo, BoxTree

    tree = BoxTree(SCENE_SIZE, 4, auto_simplify=False)
    rng = np.random.default_rng(5)
    for _ in range(SCENE_SIZE * SCENE_SIZE):
        p = tuple(int(v) for v in rng.integers(0, SCENE_SIZE, 3))
        c = Albedo.from_u32(0xFF0000FF if rng.random() < 0.5 else 0x00FF00FF)
        tree.insert(p, c)
    soft = SoftRenderer(tree, max_hits=2, max_iters=128)
    mesh = Mesh(np.array(jax.devices()[:1]), ("rays",))
    h = ROWS * n
    cam = orbit_camera(float(SCENE_SIZE), resolution=(W, h))
    opt = optax.adam(0.05)
    step = sharded_soft_train_step_e2e(soft, mesh, opt, cam.resolution)
    targets = jnp.full((W * h, 3), 0.5, dtype=jnp.float32)
    params = soft.init_params()
    opt_state = opt.init(params)
    cp = camera_params(cam)
    losses = []
    for _ in range(WARM_STEPS + TIMED_STEPS):
        params, opt_state, loss = step(soft.tree, params, opt_state, *cp,
                                       targets)
        losses.append(float(loss))
    return losses[WARM_STEPS:]


def run_n(n: int):
    """Spawn the N-process group; returns (rays_per_sec, losses)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    shape = f"{W},{ROWS},{SCENE_SIZE},{WARM_STEPS},{TIMED_STEPS}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, addr, str(pid), str(n), shape,
             REPO],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for pid in range(n)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise RuntimeError(f"{n}-process group did not complete")
    times, losses = {}, {}
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 or f"WORKER_OK {pid}" not in out:
            raise RuntimeError(f"worker {pid}/{n} failed:\n{out[-3000:]}")
        for line in out.splitlines():
            if line.startswith("WORKER_TIME"):
                times[pid] = float(line.split()[2])
            elif line.startswith("WORKER_LOSSES"):
                losses[pid] = [float(x) for x in line.split()[2:]]
    # every process computed the identical pmean'd loss trajectory
    for pid in range(1, n):
        assert losses[pid] == pytest_approx(losses[0]), (
            f"loss divergence between processes 0 and {pid}"
        )
    dt = max(times.values())  # the group finishes with its slowest member
    rays_global = W * ROWS * n
    rays_per_sec = rays_global * TIMED_STEPS / dt
    return rays_per_sec, losses[0]


def pytest_approx(xs, rtol=1e-5):
    class _A:
        def __eq__(self, other):
            return len(other) == len(xs) and all(
                abs(a - b) <= rtol * max(abs(a), abs(b), 1e-12)
                for a, b in zip(xs, other)
            )

    return _A()


def main(ns, out_path):
    results = []
    base = None
    for n in ns:
        rays_per_sec, losses = run_n(n)
        ref = _reference_losses(n)
        assert losses == pytest_approx(ref), (
            f"N={n}: distributed losses diverge from the single-device"
            f" reference\n  got {losses}\n  ref {ref}"
        )
        cores = len(os.sched_getaffinity(0))
        if base is None:
            base = rays_per_sec / n  # per-process throughput at the first N
        eff = rays_per_sec / (n * base)
        # when N exceeds the host's cores the workers timeshare — the best
        # ANY harness could do on this box is cores/N per process, so also
        # report efficiency against that host-ideal
        host_ideal = min(1.0, cores / n)
        results.append({
            "n_processes": n,
            "rays_global": W * ROWS * n,
            "rays_per_sec": round(rays_per_sec, 1),
            "weak_scaling_efficiency": round(eff, 4),
            "host_ideal_efficiency": round(host_ideal, 4),
            "efficiency_vs_host_ideal": round(eff / host_ideal, 4),
            "losses_match_single_device": True,
            "first_loss": losses[0],
            "last_loss": losses[-1],
        })
        print(f"N={n}: {rays_per_sec:,.0f} rays/s, efficiency {eff:.3f} "
              f"(host ideal {host_ideal:.3f})",
              file=sys.stderr)
    artifact = {
        "harness": "localhost multi-process jax.distributed (Gloo), "
                   "1 cpu device per process, 1 core affinity per worker, "
                   "weak scaling",
        "grade": "correctness-grade / CPU-bound — exercises the real "
                 "multi-host code path (cross-process psum per step); "
                 "NOT a TPU-pod performance claim (BASELINE >=90% needs "
                 "pod hardware)",
        "host_cores": len(os.sched_getaffinity(0)),
        "note": "for N > host_cores the workers timeshare cores, so the "
                "host-ideal efficiency is cores/N; efficiency_vs_host_ideal "
                "isolates the harness/collective overhead from that",
        "step": "sharded_soft_train_step_e2e (device raygen + multi-hit "
                "march + grad pmean + adam)",
        "per_process_rays": W * ROWS,
        "timed_steps": TIMED_STEPS,
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"metric": "weak_scaling_efficiency",
                      "value": results[-1]["weak_scaling_efficiency"],
                      "unit": "ratio",
                      "n_processes": results[-1]["n_processes"]}))


if __name__ == "__main__":
    args = sys.argv[1:]
    out = os.path.join(REPO, "SCALING.json")
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        args = args[:i] + args[i + 2:]
    ns = [int(a) for a in args] or [1, 2, 4, 8]
    main(ns, out)
