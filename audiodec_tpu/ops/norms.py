"""Functional weight-norm and spectral-norm reparametrizations.

The reference trains with torch weight_norm on generator convs and spectral
norm on the first multi-scale discriminator (ref: HiFiGAN.py:134-135,
discriminator.py:100-109, follow_official_norm).  Here the reparametrization
is explicit in the param pytree and resolved once per step:

    weight-normed conv:   {"v": ..., "g": ...[, "b"]}   w = g * v / ||v||
    spectral-normed conv: {"w_raw": ..., "u": ...[, "b"]} w = w_raw / sigma

`resolve_params(tree)` maps the tree to plain {"w","b"} conv dicts (so model
apply functions stay norm-agnostic) and returns the updated tree (spectral
norm advances its power-iteration vector `u`, like torch does per forward).

The axes g is broadcast over encode the norm reduction axes: g keeps the
preserved axis at its true size and 1 elsewhere (torch dim=0 semantics).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def weight_norm_params(p: dict, preserve_axis: int = -1) -> dict:
    """Convert {"w","b"} to weight-normed {"v","g","b"}.

    preserve_axis=-1 (output channels) replicates torch dim=0 for Conv1d/2d
    weights in our (K..., I, O) layout; use preserve_axis=-2 for transposed
    convs (torch (I, O, K) dim=0 = input channels = our axis -2... note our
    convT layout is (K, I, O) so input channels are axis 1)."""
    w = p["w"]
    axes = tuple(i for i in range(w.ndim) if i != preserve_axis % w.ndim)
    norm = jnp.sqrt(jnp.sum(w * w, axis=axes, keepdims=True))
    out = {"v": w, "g": norm}
    if "b" in p:
        out["b"] = p["b"]
    return out


def spectral_norm_params(key, p: dict) -> dict:
    """Convert {"w","b"} to spectral-normed {"w_raw","u","b"} (sigma over the
    (O, everything-else) matricization, torch dim=0 semantics)."""
    w = p["w"]
    out_ch = w.shape[-1]
    u = jax.random.normal(key, (out_ch,), w.dtype)
    u = u / (jnp.linalg.norm(u) + 1e-12)
    out = {"w_raw": w, "u": u}
    if "b" in p:
        out["b"] = p["b"]
    return out


def _resolve_weight_norm(d: dict) -> dict:
    v, g = d["v"], d["g"]
    axes = tuple(i for i, s in enumerate(g.shape) if s == 1)
    norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))
    out = {"w": g * v / norm}
    if "b" in d:
        out["b"] = d["b"]
    return out


def _resolve_spectral_norm(d: dict, n_iter: int = 1) -> Tuple[dict, dict]:
    w, u = d["w_raw"], d["u"]
    mat = w.reshape(-1, w.shape[-1])  # (IK..., O)
    for _ in range(n_iter):
        v = mat @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u_new = mat.T @ v
        u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
        u = jax.lax.stop_gradient(u_new)
        v = jax.lax.stop_gradient(v)
    sigma = v @ (mat @ u)
    out = {"w": w / sigma}
    if "b" in d:
        out["b"] = d["b"]
    new_d = dict(d)
    new_d["u"] = u
    return out, new_d


def resolve_params(tree):
    """Resolve all norm reparametrizations in a param pytree.

    Returns (effective_tree, updated_tree): effective has plain {"w","b"}
    conv dicts; updated carries advanced spectral-norm `u` vectors."""
    if isinstance(tree, dict):
        if "v" in tree and "g" in tree:
            eff = _resolve_weight_norm(tree)
            return eff, tree
        if "w_raw" in tree and "u" in tree:
            return _resolve_spectral_norm(tree)
        eff, upd = {}, {}
        for k, sub in tree.items():
            eff[k], upd[k] = resolve_params(sub)
        return eff, upd
    if isinstance(tree, (list, tuple)):
        pairs = [resolve_params(x) for x in tree]
        eff = [p[0] for p in pairs]
        upd = [p[1] for p in pairs]
        if isinstance(tree, tuple):
            eff, upd = tuple(eff), tuple(upd)
        return eff, upd
    return tree, tree


def apply_weight_norm_tree(tree, transposed_paths=()):
    """Apply weight-norm reparametrization to every conv dict in a param
    pytree (like the reference's apply_weight_norm module walk).

    `transposed_paths` is a collection of "/"-joined key paths (list indices
    as digits) whose conv dicts are transposed convs (input-channel axis 1
    preserved instead of output channels).  A path matches if it is a prefix
    of the conv dict's path."""
    tp = tuple(transposed_paths)

    def walk(node, path):
        if isinstance(node, dict):
            if "w" in node:
                transposed = any(path.startswith(p) for p in tp)
                return weight_norm_params(
                    node, preserve_axis=1 if transposed else -1)
            return {k: walk(v, f"{path}/{k}" if path else k)
                    for k, v in node.items()}
        if isinstance(node, list):
            return [walk(x, f"{path}/{i}") for i, x in enumerate(node)]
        if isinstance(node, tuple):
            return tuple(walk(x, f"{path}/{i}") for i, x in enumerate(node))
        return node
    return walk(tree, "")
