"""Checkpoint / resume.

The reference has NO restart path (SURVEY 5.4: `USE_HDF5` exists but is
unused; long DNS runs simply rerun — docs note one-way VTK snapshots only).
This module exceeds that: orbax-backed array checkpointing of the full state
pytree plus the config, so any run (including multi-chip sharded states) can
resume bit-exactly.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax
import numpy as np

from ..config import Config
from ..fields import State


def _state_to_numpy(state: State) -> dict:
    out = {}
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        if v is not None:
            out[f.name] = np.asarray(v)
    return out


def save_checkpoint(path: str, state: State, cfg: Config,
                    step: Optional[int] = None) -> str:
    """Write `<path>/ckpt_<step>/` with state arrays + config JSON.

    Uses orbax when available; falls back to a plain .npz (same layout
    either way from the caller's perspective).
    """
    step = int(state.step) if step is None else step
    d = os.path.join(path, f"ckpt_{step:09d}")
    # write into a temp dir and rename at the end so a run killed mid-save
    # never leaves a half-written "latest" checkpoint
    tmp = d + ".tmp"
    if os.path.isdir(tmp):
        import shutil
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    arrays = _state_to_numpy(state)
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        # only a MISSING orbax selects the npz fallback; a real orbax
        # write failure (disk quota, permissions) must propagate, not
        # silently switch format mid-run
        np.savez(os.path.join(tmp, "state.npz"), **arrays)
    else:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(os.path.abspath(tmp), "state"), arrays,
                   force=True)
    cfg_dict = {f.name: getattr(cfg, f.name) for f in dataclasses.fields(cfg)}
    cfg_json = {k: (v.value if hasattr(v, "value") else
                    list(v) if isinstance(v, tuple) else v)
                for k, v in cfg_dict.items()}
    with open(os.path.join(tmp, "config.json"), "w") as fh:
        json.dump(cfg_json, fh, indent=1, default=str)
    if os.path.isdir(d):
        import shutil
        shutil.rmtree(d)
    os.rename(tmp, d)
    return d


def latest_checkpoint(path: str) -> Optional[str]:
    """Newest COMPLETE checkpoint (config.json is renamed into place last,
    so its presence marks a fully-written directory)."""
    if not os.path.isdir(path):
        return None
    cks = sorted(x for x in os.listdir(path)
                 if x.startswith("ckpt_") and not x.endswith(".tmp")
                 and os.path.exists(os.path.join(path, x, "config.json")))
    return os.path.join(path, cks[-1]) if cks else None


def load_checkpoint(d: str, cfg: Config, sim=None) -> State:
    """Restore a State; missing optional fields stay None.

    Pass `sim` to re-apply the run's sharding: arrays load onto the
    default device otherwise, so a multi-chip resume would OOM on
    fields that only fit sharded (and would recompile unsharded)."""
    from ..fields import zero_state
    proto = zero_state(cfg)
    npz = os.path.join(d, "state.npz")
    if os.path.exists(npz):
        data = dict(np.load(npz))
    else:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        data = ckptr.restore(os.path.join(os.path.abspath(d), "state"))
    import jax.numpy as jnp
    kw = {}
    for f in dataclasses.fields(proto):
        if f.name in data:
            ref = getattr(proto, f.name)
            dt = ref.dtype if ref is not None else None
            kw[f.name] = jnp.asarray(data[f.name], dt)
    state = proto.replace(**kw)
    if sim is not None and getattr(sim, "device_mesh", None) is not None:
        from ..parallel.sharding import shard_state
        state = shard_state(state, sim.device_mesh, sim._mesh_axes)
    return state
