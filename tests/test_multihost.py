"""Two-process jax.distributed run of the sharded kNN (the DCN/multi-host
path, SURVEY.md §2 distributed-backend row): each process owns 4 virtual CPU
devices; the global 8-device mesh shards the base corpus across both
processes and every process verifies the allgathered result against the
single-device oracle. Runs in subprocesses because jax.distributed can only
initialize once per process."""

import os
import socket
import subprocess
import sys
import textwrap

_WORKER = textwrap.dedent("""
    import sys, os
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from neighborhoodwatch_tpu.parallel.mesh import init_distributed, make_mesh
    init_distributed(coordinator="localhost:" + port,
                     num_processes=2, process_id=pid)
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils
    from neighborhoodwatch_tpu.parallel.mesh import DP_AXIS, MP_AXIS
    from neighborhoodwatch_tpu.parallel.sharded_knn import sharded_knn
    from neighborhoodwatch_tpu.ops.knn import knn

    rng = np.random.default_rng(0)
    q = rng.standard_normal((64, 32)).astype(np.float32)
    b = rng.standard_normal((1024, 32)).astype(np.float32)
    mesh = make_mesh(8, dp=2)

    def put(x, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh, lambda i: x[i])

    d, i = sharded_knn(put(q, P(DP_AXIS, None)), put(b, P(MP_AXIS, None)),
                       k=10, mesh=mesh)
    i_full = multihost_utils.process_allgather(i, tiled=True)
    ref_d, ref_i = knn(q, b, k=10)
    np.testing.assert_array_equal(np.asarray(i_full), np.asarray(ref_i))
    print("MULTIHOST_OK", pid)
""").format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_knn(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen([sys.executable, str(script), str(pid), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for pid in (0, 1)]
    outs = [p.communicate(timeout=520)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK {pid}" in out
