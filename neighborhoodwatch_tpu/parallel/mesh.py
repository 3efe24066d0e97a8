"""Device mesh construction for multi-chip scale-out.

The reference never uses its NCCL/ucx/dask dependencies (SURVEY.md §2:
pinned but zero imports; GPU0 hardcoded at cu_knn.py:64-65). Here
distribution is first-class: a 2D `jax.sharding.Mesh` with

- axis "dp": query/data parallelism — each group of chips owns a slice of
  the query set (embarrassingly parallel);
- axis "mp": base-corpus parallelism — the base axis is sharded across
  chips and per-shard top-k lists are merged with an ICI all_gather
  (the sequence-parallel analog identified in SURVEY.md §2).

Multi-host pods: call `init_distributed()` first so jax.devices() spans
hosts; "dp" then rides DCN while "mp" stays on ICI.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
MP_AXIS = "mp"


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Initialize multi-host JAX (NCCL-bootstrap analog). No-op when
    single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              devices=None) -> Mesh:
    """Build a (dp, mp) mesh over the available devices.

    By default all devices go to the base axis ("mp") — ground-truth
    generation is dominated by the base corpus scan, and query-DP only
    helps once base shards fit comfortably per chip."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices <= len(devices), (
        f"asked for {n_devices} devices but only {len(devices)} visible "
        f"({jax.default_backend()} backend) — on a single-chip host use "
        f"JAX_PLATFORMS=cpu with "
        f"XLA_FLAGS=--xla_force_host_platform_device_count=N to rehearse "
        f"a mesh")  # r3 review: the old slice failed as an opaque reshape
    devices = devices[:n_devices]
    if dp is None:
        dp = 1
    assert n_devices % dp == 0, f"{n_devices} devices not divisible by dp={dp}"
    mp = n_devices // dp
    mesh_devices = np.asarray(devices).reshape(dp, mp)
    return Mesh(mesh_devices, (DP_AXIS, MP_AXIS))


def query_sharding(mesh: Mesh) -> NamedSharding:
    """Queries: sharded over dp, replicated over mp."""
    return NamedSharding(mesh, P(DP_AXIS, None))


def base_sharding(mesh: Mesh) -> NamedSharding:
    """Base corpus: sharded over mp, replicated over dp."""
    return NamedSharding(mesh, P(MP_AXIS, None))


def result_sharding(mesh: Mesh) -> NamedSharding:
    """Top-k results: sharded over dp like the queries."""
    return NamedSharding(mesh, P(DP_AXIS, None))
