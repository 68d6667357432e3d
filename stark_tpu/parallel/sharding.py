"""SPMD sharding of the element/vertex arrays over a device mesh.

The reference's only parallelism is OpenMP threads over flat element arrays
(SURVEY.md §2.8). The TPU analog shards

  * the DOF vector / vertex arrays by contiguous block ranges,
  * each potential family's element tables by element index,
  * contact-pair buffers by pair index,

over a 1-D `jax.sharding.Mesh` data axis. Cross-shard coupling (elements
whose vertices live on other shards) is handled by XLA-inserted collectives
around the segment-sum scatters and CG dot products — the "let XLA insert
collectives" recipe: we annotate shardings with NamedSharding and jit does
the rest (psum/all-gathers ride ICI).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("data",))


def _pad_leading(x, pad):
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(np.asarray(x), widths)


def shard_family_data(mesh: Mesh, data: dict) -> dict:
    """Shard each family's element tables along the element axis. Tables
    whose leading dim does not divide the mesh are PADDED to divisible with
    inactive rows (active=0 masks them out of every reduction) — never
    silently replicated."""
    n = mesh.devices.size
    spec = NamedSharding(mesh, P("data"))
    sharded = {}
    for name, fd in data.items():
        cap = fd["conn"].shape[0]
        pad = (-cap) % n
        conn = jax.device_put(_pad_leading(fd["conn"], pad), spec)
        rows = {k: jax.device_put(_pad_leading(v, pad), spec)
                for k, v in fd["rows"].items()}
        sharded[name] = {"conn": conn, "rows": rows}
    return sharded


def replicate(mesh: Mesh, tree):
    spec = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, spec), tree)
