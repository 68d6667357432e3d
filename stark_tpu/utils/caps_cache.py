"""Persistent learned-capacity cache for the fused solve's static buffers.

Every dynamic buffer in the fused program is a fixed-capacity table; a
capacity overflow doubles the cap and re-traces (~100-130 s of remote TPU
compile per bump, measured).  The initial caps are mesh-statistic
heuristics, and when a scene's true pileup exceeds them the first run pays
a serial chain of bump->retrace cycles.  This module remembers the bumped
capacities per mesh signature (primitive counts), so every later process
running the same scene starts at the learned caps and traces exactly once —
the same role the reference's growing std::vectors play across frames
(EnergyFrictionalContact.cpp:368-430), made persistent because our "growth"
costs a compile rather than a realloc.

File format: {signature: {cap_name: cap}} at $STARK_TPU_CAPS_CACHE
(default ~/.cache/stark_tpu_caps.json; set the env var empty to disable).
Entries only ever grow (max-merge), so concurrent writers are safe-ish; a
torn read falls back to the heuristics, which is correct, just slower.
"""
from __future__ import annotations

import json
import os
import threading

_LOCK = threading.Lock()


def _path() -> str:
    return os.environ.get(
        "STARK_TPU_CAPS_CACHE",
        os.path.expanduser("~/.cache/stark_tpu_caps.json"))


def load(sig: str) -> dict:
    """Learned caps for this signature ({} when absent/disabled)."""
    p = _path()
    if not p:
        return {}
    try:
        with open(p) as f:
            d = json.load(f)
        caps = d.get(sig, {})
        return {str(k): int(v) for k, v in caps.items()}
    except (OSError, ValueError):
        return {}


def store(sig: str, caps: dict) -> None:
    """Max-merge `caps` into the signature's entry."""
    p = _path()
    if not p or not caps:
        return
    with _LOCK:
        try:
            with open(p) as f:
                d = json.load(f)
        except (OSError, ValueError):
            d = {}
        cur = d.get(sig, {})
        for k, v in caps.items():
            cur[str(k)] = max(int(v), int(cur.get(str(k), 0)))
        d[sig] = cur
        try:
            os.makedirs(os.path.dirname(p), exist_ok=True)
            tmp = "%s.%d.tmp" % (p, os.getpid())
            with open(tmp, "w") as f:
                json.dump(d, f, indent=0, sort_keys=True)
            os.replace(tmp, p)
        except OSError:
            pass
