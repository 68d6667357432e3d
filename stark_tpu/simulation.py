"""Simulation facade: the single user entry point.

Reference: /root/reference/stark/src/models/Simulation.{h,cpp} — owns
core::Stark + deformables + rigidbodies + interactions + presets, exposes
run()/run_one_time_step()/add_time_event and getters. Because the rebuild's
user API is Python already, this class is also the pystark equivalent
(pystark/pystark/__init__.py:67-107).

This facade additionally owns the "data manager": it freezes all static
potential family tables into padded device arrays at first step, regenerates
dirty families (param changes, animated targets, stiffness hardening), merges
dynamic contact tables, and wires the DOF connector (DofLayout) into the core.
"""
from __future__ import annotations

import math
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from .core.script import EventDrivenScript, EventInfo
from .core.settings import Settings
from .core.stark import Stark
from .models.point_dynamics import PointDynamics
from .models.rigid_dynamics import RigidBodyDynamics
from .solver.dofs import DofLayout
from .solver.potential import FamilyData, pad_family_data


def _to_device(fd: FamilyData, dtype) -> Dict:
    rows = {}
    for k, v in fd.rows.items():
        v = np.asarray(v)
        if np.issubdtype(v.dtype, np.floating):
            rows[k] = jnp.asarray(v, dtype)
        else:
            rows[k] = jnp.asarray(v, jnp.int32)
    return {"conn": jnp.asarray(np.asarray(fd.conn), jnp.int32), "rows": rows}


class Simulation:
    def __init__(self, settings: Optional[Settings] = None):
        self.stark = Stark(settings or Settings())

        # Base dynamics
        self._dyn = PointDynamics(self.stark)
        self._rb_dyn = RigidBodyDynamics(self.stark)

        # Physical systems (each registers potentials + callbacks in __init__,
        # the reference's plugin pattern, Simulation.cpp:84-100)
        from .models.deformables.deformables import Deformables
        from .models.rigidbodies.rigidbodies import RigidBodies
        from .models.interactions.interactions import Interactions
        from .presets.presets import Presets

        self.deformables = Deformables(self.stark, self._dyn)
        self.rigidbodies = RigidBodies(self.stark, self._rb_dyn)
        self.interactions = Interactions(self.stark, self._dyn, self._rb_dyn,
                                         self.rigidbodies)
        self.presets = Presets(self.stark, self.deformables, self.rigidbodies,
                               self.interactions)

        self.script = EventDrivenScript()
        self._layout: Optional[DofLayout] = None
        self._device_data: Dict[str, Dict] = {}
        self._capacities: Dict[str, int] = {}
        self._mesh = None

        self.stark.add_init_hook(self._freeze)
        self.stark.connect(
            n_blocks_fn=lambda: self._layout.n_blocks,
            get_dofs=self._get_dofs,
            set_dofs=self._set_dofs,
            get_glob=self._get_glob,
            get_data=self._get_data,
            get_static_data=self._get_static_data,
            get_friction_data=lambda: self.interactions.contact.friction_family_data(),
            get_engine=lambda: (self.interactions.contact._engine
                                if self.interactions.contact.enabled else None),
            prime_host_dofs=self._prime_host_dofs,
        )

    # ------------------------------------------------------------------
    # public API (Simulation.h:13-43)
    # ------------------------------------------------------------------
    def get_time(self) -> float:
        return self.stark.current_time

    def get_time_step_size(self) -> float:
        return self.stark.dt

    def get_frame(self) -> int:
        return self.stark.current_frame

    def get_gravity(self) -> np.ndarray:
        return self.stark.gravity

    def set_gravity(self, gravity):
        self.stark.gravity = np.asarray(gravity, dtype=np.float64)

    def get_logger(self):
        return self.stark.logger

    def get_settings(self) -> Settings:
        return self.stark.settings

    def get_script(self) -> EventDrivenScript:
        return self.script

    def get_stark(self) -> Stark:
        return self.stark

    def add_time_event(self, t0: float, t1: float, action: Callable):
        """action(t) or action(t, event_info), active while t in [t0, t1)
        (Simulation.cpp:39-50)."""
        import inspect

        n_args = len(inspect.signature(action).parameters)

        def _action(info: EventInfo):
            if n_args >= 2:
                action(self.get_time(), info)
            else:
                action(self.get_time())

        self.script.add_event(
            run_when=lambda info: t0 <= self.get_time() < t1,
            action=_action,
            delete_when=lambda info: self.get_time() >= t1,
        )

    def run(self, duration: float = math.inf, callback: Optional[Callable] = None) -> bool:
        def cb():
            self.script.run_a_cycle(self.get_time())
            if callback is not None:
                callback()

        return self.stark.run(duration, cb)

    def run_one_time_step(self) -> bool:
        self.script.run_a_cycle(self.get_time())
        return self.stark.run_one_step()

    # ------------------------------------------------------------------
    # freeze + data management
    # ------------------------------------------------------------------
    def _freeze(self):
        dtype = self.stark.dtype
        self._dyn.freeze(dtype)
        self._rb_dyn.freeze(dtype)
        self._layout = DofLayout(self._dyn.n_points, self._rb_dyn.n_bodies)
        self.stark.layout = self._layout

        dev = self.stark.settings.device
        pad = dev.element_pad_multiple
        if dev.n_devices > 1:
            # SPMD data parallelism over elements (SURVEY §2.8): element
            # tables shard along the element axis; padding to a multiple of
            # the mesh size keeps every table exactly divisible. The jitted
            # solve then compiles SPMD — gradient scatters and CG dots reduce
            # across shards via XLA GSPMD collectives over ICI.
            from .parallel.sharding import make_mesh
            self._mesh = make_mesh(dev.n_devices)
            pad = int(np.lcm(pad, dev.n_devices))
        else:
            self._mesh = None
        gp = self.stark.global_potential
        static = gp.freeze_static_data(pad)
        for name, fd in static.items():
            self._capacities[name] = fd.conn.shape[0]
            self._device_data[name] = self._place(_to_device(fd, dtype))
        self.stark.dirty_families.clear()
        # let dynamic models (contact) finalize their device tables
        self.interactions.freeze(self._layout, dtype)

    def _place(self, fd_dict):
        """Device placement of one family table: sharded over the mesh's
        data axis when multi-device, default placement otherwise."""
        if self._mesh is None:
            return fd_dict
        from .parallel.sharding import shard_family_data
        return shard_family_data(self._mesh, {"_": fd_dict})["_"]

    def _refresh_dirty(self):
        if not self.stark.dirty_families:
            return
        dtype = self.stark.dtype
        gp = self.stark.global_potential
        pad = self.stark.settings.device.element_pad_multiple
        fam_by_name = {f.name: f for f in gp.families}
        for name in list(self.stark.dirty_families):
            if name not in self._device_data:
                continue  # family had no elements at freeze; stays empty
            provider = gp.get_provider(name)
            if provider is None:
                continue
            fd = provider()
            if fd is None:
                continue
            fd = pad_family_data(fd, fam_by_name[name].arity, pad,
                                 capacity=self._capacities[name])
            self._device_data[name] = self._place(_to_device(fd, dtype))
        self.stark.dirty_families.clear()

    def _get_data(self):
        self._refresh_dirty()
        data = dict(self._device_data)
        data.update(self.interactions.dynamic_family_data())
        return data

    def _get_static_data(self):
        self._refresh_dirty()
        return dict(self._device_data)

    def _get_glob(self):
        dtype = self.stark.dtype
        glob = {
            "dt": jnp.asarray(self.stark.dt, dtype),
            "gravity": jnp.asarray(self.stark.gravity, dtype),
        }
        if self._dyn.n_points > 0:
            glob.update(self._dyn.glob_entries())
        if self._rb_dyn.n_bodies > 0:
            glob.update(self._rb_dyn.glob_entries())
            glob.update(self.rigidbodies.inertia.glob_entries())
        glob.update(self.interactions.glob_entries())
        return glob

    # ------------------------------------------------------------------
    # DOF connector (GlobalPotential get/set_dofs analog)
    # ------------------------------------------------------------------
    def _get_dofs(self):
        ns, nr = self._layout.n_soft, self._layout.n_rigid
        parts = []
        if ns > 0:
            parts.append(self._dyn.v1)
        if nr > 0:
            parts.append(jnp.stack([self._rb_dyn.v1, self._rb_dyn.w1], axis=1).reshape(-1, 3))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)

    def _set_dofs(self, u):
        ns, nr = self._layout.n_soft, self._layout.n_rigid
        if ns > 0:
            self._dyn.v1 = u[:ns]
        if nr > 0:
            rw = u[ns:].reshape(nr, 2, 3)
            self._rb_dyn.v1 = rw[:, 0]
            self._rb_dyn.w1 = rw[:, 1]

    def _prime_host_dofs(self, u_np: np.ndarray):
        """Feed all host DOF mirrors from the solver's single per-step
        device->host transfer (newton._solve_fused pulls (u, stats, counts)
        once; every further pull would cost a ~25 ms relay round trip)."""
        ns, nr = self._layout.n_soft, self._layout.n_rigid
        if ns > 0:
            self._dyn.prime_host_v1(u_np[:ns])
        if nr > 0:
            rw = u_np[ns:].reshape(nr, 2, 3)
            self._rb_dyn.prime_host(rw[:, 0], rw[:, 1])
