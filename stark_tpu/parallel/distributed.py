"""Multi-host (multi-process) SPMD support via jax.distributed.

The reference has no distributed backend at all — its parallelism is OpenMP
shared memory (SURVEY.md §2.8). For the TPU build, scaling past one host
means multiple controller processes, each owning its local devices, joined
into one global mesh: `jax.distributed.initialize` wires the processes to a
coordinator, after which `jax.devices()` spans all hosts and a
`jax.sharding.Mesh` over it makes jit-inserted collectives ride ICI within
a slice and DCN across hosts.

Design notes (the scaling-book recipe):
  * One process per host; each sees only its local chips via
    jax.local_devices() but addresses the global device list in the mesh.
  * Element tables shard over the global data axis exactly as in
    sharding.py — each process materializes ONLY its local shard (via
    jax.make_array_from_callback), so no host holds the full table.
  * Scalar reductions (energy, residual, CG dots) stay XLA collectives —
    nothing in the solver changes between 1 and N processes.

CI without hardware: tests/test_multihost.py launches 2 coordinator-joined
CPU processes (4 virtual devices each) over localhost and asserts the
8-way sharded evaluation matches the single-process result bit-for-bit in
f64 — the same equality oracle as tests/test_sharding_equality.py.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class DistributedConfig:
    """Process-topology settings (core/settings.py DeviceSettings carries an
    optional instance; env vars override for launcher convenience)."""
    coordinator_address: Optional[str] = None   # "host:port"
    num_processes: int = 1
    process_id: int = 0

    @staticmethod
    def from_env() -> "DistributedConfig":
        return DistributedConfig(
            coordinator_address=os.environ.get("STARK_TPU_COORDINATOR") or None,
            num_processes=int(os.environ.get("STARK_TPU_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("STARK_TPU_PROCESS_ID", "0")),
        )


_initialized = False


def initialize(config: Optional[DistributedConfig] = None) -> bool:
    """Join this process to the jax.distributed coordination service.
    Returns True when running multi-process (after initialize), False for
    the single-process fast path. Idempotent."""
    global _initialized
    cfg = config or DistributedConfig.from_env()
    if cfg.num_processes <= 1 or not cfg.coordinator_address:
        return False
    if _initialized:
        return True
    import jax

    jax.distributed.initialize(
        coordinator_address=cfg.coordinator_address,
        num_processes=cfg.num_processes,
        process_id=cfg.process_id,
    )
    _initialized = True
    return True


def global_mesh(axis: str = "data"):
    """1-D mesh over ALL processes' devices (call after initialize())."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def shard_family_data_global(mesh, data: dict) -> dict:
    """Multi-process analog of sharding.shard_family_data: shard each
    family's element tables along the element axis of a global (possibly
    multi-host) mesh. Each process materializes only the shard rows its
    local devices own; padding rows (active=0) fill non-divisible tails."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.devices.size
    spec = NamedSharding(mesh, P("data"))
    out = {}

    def put(x):
        x = np.asarray(x)
        cap = x.shape[0]
        pad = (-cap) % n
        if pad:
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            x = np.pad(x, widths)
        full_shape = x.shape

        def cb(index):
            return x[index]

        return jax.make_array_from_callback(full_shape, spec, cb)

    for name, fd in data.items():
        out[name] = {"conn": put(fd["conn"]),
                     "rows": {k: put(v) for k, v in fd["rows"].items()}}
    return out


def replicate_global(mesh, tree):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)

        def cb(index):
            return x[index]

        return jax.make_array_from_callback(x.shape, spec, cb)

    return jax.tree_util.tree_map(put, tree)
