"""Real two-process jax.distributed validation (DCN-analog on localhost).

Spawns two Python processes that join one distributed runtime via
``parallel.distributed.initialize``, build the global mesh, and run a
cross-process ``psum`` — the actual multi-host code path (TPU pods differ
only in transport).  Kept robust: ephemeral port, generous timeout, and a
skip (not a failure) if the local environment cannot form the pair.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    # load distributed.py standalone: the parallel package __init__ imports
    # renderer modules that initialize the XLA backend, which must not
    # happen before jax.distributed.initialize
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "dist_standalone",
        os.path.join("voxelhex_tpu", "parallel", "distributed.py"),
    )
    distributed = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(distributed)

    addr, pid = sys.argv[1], int(sys.argv[2])
    n, i = distributed.initialize(
        coordinator_address=addr, num_processes=2, process_id=pid
    )
    assert (n, i) == (2, pid), (n, i)
    assert len(jax.devices()) == 2  # one cpu device per process, global view

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = distributed.global_ray_mesh()
    # each process contributes its local shard; psum must see both
    local = jnp.full((1,), float(pid + 1))
    arr = jax.make_array_from_single_device_arrays(
        (2,), NamedSharding(mesh, P("rays")), [local]
    )

    def f(x):
        return jax.shard_map(
            lambda v: jax.lax.psum(v, "rays"), mesh=mesh,
            in_specs=P("rays"), out_specs=P("rays"),
        )(x)

    out = jax.jit(f)(arr)
    local_out = [s.data for s in out.addressable_shards][0]
    assert float(local_out[0]) == 3.0, local_out  # 1 + 2 summed across hosts
    lo, hi = distributed.host_local_slice(10)
    assert (lo, hi) == (5 * pid, 5 * pid + 5)
    print("WORKER_OK", pid)
    """
)


def test_two_process_distributed_psum():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"

    # scrub the pytest conftest's 8-device XLA_FLAGS: each worker process
    # must contribute exactly one cpu device to the global view
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, addr, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed pair did not form (environment limitation)")

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {pid}" in out
