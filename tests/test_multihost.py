"""Multi-process (multi-host topology) equality test over localhost.

Launches 2 coordinator-joined processes, each with 4 virtual CPU devices
(the process topology of a 2-host TPU pod without the hardware), shards a
real evaluation — the cloth scene's energy/gradient through the registered
potential families — over the global 8-device mesh, and asserts the result
equals the single-process unsharded evaluation. This is the §2.8 DCN story
the reference never needed (its parallelism is OpenMP-only): the same
jax.distributed wiring and global-mesh sharding drive real multi-host runs
via stark_tpu.parallel.distributed.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.environ["STARK_REPO"])
import numpy as np
from stark_tpu.parallel import distributed as dist

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
out_path = sys.argv[3]

assert dist.initialize(dist.DistributedConfig(
    coordinator_address="localhost:%s" % os.environ["STARK_COORD_PORT"],
    num_processes=nproc, process_id=pid))
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == nproc * 4, len(jax.devices())

import __graft_entry__ as ge

sim = ge._build_cloth_scene(n_quads=4, with_contact=True)
nm = sim.stark.newton
data = nm.get_data()
glob = nm.get_glob()
u = nm.get_dofs()

mesh = dist.global_mesh()
data_s = dist.shard_family_data_global(mesh, data)
glob_s = dist.replicate_global(mesh, glob)
u_s = dist.replicate_global(mesh, np.asarray(u))

E, grad = jax.jit(nm._energy_grad)(u_s, data_s, glob_s)
# E and grad are replicated: every process's addressable shard holds the
# full value (out-specs default to replicated for unannotated outputs)
E = float(np.asarray(E.addressable_shards[0].data))
gl = np.asarray(grad.addressable_shards[0].data)
if pid == 0:
    np.savez(out_path, E=E, grad=gl)
print("proc", pid, "E", E, flush=True)
"""


def test_two_process_equality(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    out_path = tmp_path / "result.npz"

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["STARK_REPO"] = _REPO
    env["STARK_COORD_PORT"] = str(port)
    env["STARK_TPU_COMPILE_CACHE"] = ""
    env.pop("JAX_PLATFORMS", None)

    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", str(out_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    got = np.load(str(out_path))

    # single-process reference (this process: CPU via conftest)
    import __graft_entry__ as ge
    import jax

    sim = ge._build_cloth_scene(n_quads=4, with_contact=True)
    nm = sim.stark.newton
    E_ref, grad_ref = jax.jit(nm._energy_grad)(
        nm.get_dofs(), nm.get_data(), nm.get_glob())

    assert abs(float(got["E"]) - float(E_ref)) <= 1e-9 * max(1.0, abs(float(E_ref)))
    np.testing.assert_allclose(np.asarray(got["grad"]),
                               np.asarray(grad_ref), rtol=0, atol=1e-9)
