"""Checkpoint save/load for train states and params (SURVEY.md §5).

Format: msgpack via flax.serialization for the pytree + a small JSON header
(steps, config snapshot path).  Layout mirrors the reference's pickle dict
{'model': {...}, 'optimizer': ..., 'steps': ...}
(ref: trainer/trainerGAN.py:95-149) but framework-native.

`load_only_params` supports warm-starting (the reference's `initial:` config
key) and cross-model loads (vocoder training loading a frozen analyzer).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, state: Dict[str, Any], steps: int,
                    extra: Optional[dict] = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    state = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    payload = serialization.to_bytes(state)
    header = {"steps": int(steps), **(extra or {})}
    with open(path, "wb") as f:
        hdr = json.dumps(header).encode()
        f.write(len(hdr).to_bytes(8, "little"))
        f.write(hdr)
        f.write(payload)


def load_checkpoint(path: str, template: Optional[Dict[str, Any]] = None):
    """-> (state, header).  With a template, the pytree structure is restored
    onto it (lists stay lists, namedtuple opt states are rebuilt); without,
    returns raw nested dicts."""
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(n).decode())
        payload = f.read()
    if template is not None:
        state = serialization.from_bytes(template, payload)
    else:
        state = serialization.msgpack_restore(payload)
    return state, header


def _resolve_norms_state_dict(tree):
    """Fold weight-norm/spectral-norm reparametrizations ({'v','g'} /
    {'w_raw','u'}) found in a raw state-dict tree into plain {'w'} convs, so
    checkpoints from reparametrized training load into inference templates."""
    from audiodec_tpu.ops.norms import resolve_params

    if isinstance(tree, dict) and ("v" in tree and "g" in tree
                                   or "w_raw" in tree and "u" in tree):
        eff, _ = resolve_params(tree)
        return jax.tree_util.tree_map(np.asarray, eff)
    if isinstance(tree, dict):
        return {k: _resolve_norms_state_dict(v) for k, v in tree.items()}
    return tree


def load_only_params(path: str, key: str = "gen", template=None):
    """Load just a sub-pytree's params (warm start / analyzer load /
    inference).  With `template`, restores onto that pytree structure,
    folding any norm reparametrizations first."""
    state, header = load_checkpoint(path)
    sub = state[key] if key in state else state
    if template is not None:
        sub = _resolve_norms_state_dict(sub)
        sub = serialization.from_state_dict(template, sub)
    return sub, header
