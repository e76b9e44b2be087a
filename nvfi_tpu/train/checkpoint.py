"""Checkpoint save/restore: array state + static shape metadata.

Mirrors the reference's two-part checkpoint structure (SURVEY.md §5.4): the
reference saves ``model_state_dict`` + ``nvfi_kwarg`` structural metadata and
rebuilds the module at the checkpointed shapes before loading state
(reference train_nvfi.py:359-392).  Here the split is natural: arrays go into
an ``.npz`` (pytree flattened to path-keyed entries), and the static
``KPlaneMeta`` (which *is* the shape metadata) plus the training-schedule
position go into a JSON sidecar — restore rebuilds meta first, then the
param pytree, exactly like the reference's ``update_nvfi_kwargs`` dance.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import re

import jax
import numpy as np

from ..fields.kplane import KPlaneMeta
from ..fields.velocity import VelGate


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is None:
        out[prefix[:-1] + "__none"] = np.zeros((0,))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    root = {}
    for key, value in flat.items():
        if key.endswith("__none"):
            parts = key[: -len("__none")].rstrip("/").split("/") if key != "__none" else []
            node_val = None
        else:
            parts = key.split("/")
            node_val = value
        if not parts:
            return node_val
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = node_val

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(re.fullmatch(r"\d+", k) for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)


def meta_to_json(meta: KPlaneMeta) -> dict:
    d = dataclasses.asdict(meta)
    d["vel_gate"] = {"mode": meta.vel_gate.mode, "eps": meta.vel_gate.eps,
                     "bounds": meta.vel_gate.bounds, "world": meta.vel_gate.world}
    return d


def meta_from_json(d: dict) -> KPlaneMeta:
    d = dict(d)
    g = d.pop("vel_gate")
    gate = VelGate(
        g["mode"], g["eps"],
        tuple(tuple(b) for b in g["bounds"]) if g["bounds"] else (),
        # pre-round-5 checkpoints carry no world box; () keeps shrink inert
        tuple(tuple(b) for b in g.get("world", ())) if g.get("world") else (),
    )

    def tupleize(x):
        if isinstance(x, list):
            return tuple(tupleize(v) for v in x)
        return x

    d = {k: tupleize(v) for k, v in d.items()}
    return KPlaneMeta(vel_gate=gate, **d)


def save(path: str, params, meta: KPlaneMeta, opt_state=None, alpha_state=None,
         extra: dict | None = None):
    """Write ``path.npz`` (arrays) + ``path.json`` (static metadata)."""
    arrays = {"params/" + k: v for k, v in _flatten(jax.device_get(params)).items()}
    if opt_state is not None:
        arrays.update({"opt/" + k: v for k, v in _flatten(jax.device_get(opt_state)).items()})
    if alpha_state is not None:
        arrays.update({"alpha/" + k: v for k, v in _flatten(jax.device_get(alpha_state)).items()})
    np.savez(path + ".npz", **arrays)
    sidecar = {"meta": meta_to_json(meta), "extra": extra or {}}
    with open(path + ".json", "w") as f:
        json.dump(sidecar, f)


def load(path: str):
    """Returns (params, meta, opt_state|None, alpha_state|None, extra)."""
    with open(path + ".json") as f:
        sidecar = json.load(f)
    meta = meta_from_json(sidecar["meta"])
    data = np.load(path + ".npz")
    groups = {"params": {}, "opt": {}, "alpha": {}}
    for k in data.files:
        head, _, rest = k.partition("/")
        groups[head][rest] = data[k]
    params = _unflatten(groups["params"])
    opt_state = _unflatten(groups["opt"]) if groups["opt"] else None
    alpha_state = _unflatten(groups["alpha"]) if groups["alpha"] else None
    return params, meta, opt_state, alpha_state, sidecar.get("extra", {})


def find_checkpoint(logdir: str, step: int = -1) -> str | None:
    """Pick a numbered or latest checkpoint (reference
    utils/evaluation_utils.py:20-43 falls back to newest with a warning)."""
    ckpts = sorted(glob.glob(os.path.join(logdir, "model_*.json")))
    if not ckpts:
        return None
    if step >= 0:
        want = os.path.join(logdir, f"model_{step:05d}.json")
        if want in ckpts:
            return want[: -len(".json")]
        print(f"[checkpoint] step {step} not found, using latest")
    return ckpts[-1][: -len(".json")]
