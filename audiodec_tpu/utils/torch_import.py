"""PyTorch -> JAX checkpoint importer for reference AudioDec checkpoints.

Maps the reference state_dict naming scheme (ref: models/autoencoder/
AudioDec.py, models/vocoder/HiFiGAN.py) onto our parameter pytrees, with
layout conversion:

    Conv1d   (O, I, K)   -> (K, I, O)
    ConvT1d  (I, O, K)   -> (K, I, O), kernel flipped ("gathering" orientation)
    Conv2d   (O, I, H, W)-> (H, W, I, O)
    VQ embed (D, N)      -> (N, D)

Weight-normalized layers (`weight_g`/`weight_v` pairs, torch dim=0 semantics)
are folded into plain kernels: w = g * v / ||v||_{dims != 0}
(needed for released vocoder checkpoints, ref: HiFiGAN.py weight norm default
on; SURVEY.md §5 checkpoint subsystem).

This module is torch-free: it consumes a {name: np.ndarray} dict.  Use
`load_torch_checkpoint` (requires torch) to read a reference .pkl file.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp


def fold_weight_norm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold every `X.weight_g`/`X.weight_v` pair into `X.weight`."""
    out = {}
    done = set()
    for k in sd:
        if k.endswith("weight_g"):
            base = k[: -len("weight_g")]
            v = np.asarray(sd[base + "weight_v"], dtype=np.float64)
            g = np.asarray(sd[k], dtype=np.float64)
            axes = tuple(range(1, v.ndim))
            norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
            out[base + "weight"] = (g * v / norm).astype(np.float32)
            done.add(k)
            done.add(base + "weight_v")
    for k, a in sd.items():
        if k not in done and not k.endswith(("weight_g", "weight_v")):
            out.setdefault(k, np.asarray(a))
    return out


def _conv(sd, prefix, bias=True):
    w = np.asarray(sd[prefix + ".weight"], np.float32)
    p = {"w": jnp.asarray(np.transpose(w, (2, 1, 0)))}
    if bias and prefix + ".bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[prefix + ".bias"], np.float32))
    return p


def _convT(sd, prefix, bias=True):
    w = np.asarray(sd[prefix + ".weight"], np.float32)  # (I, O, K)
    w = np.transpose(w[:, :, ::-1].copy(), (2, 0, 1))   # (K, I, O)
    p = {"w": jnp.asarray(w)}
    if bias and prefix + ".bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[prefix + ".bias"], np.float32))
    return p


def _conv2d(sd, prefix, bias=True):
    w = np.asarray(sd[prefix + ".weight"], np.float32)  # (O, I, H, W)
    p = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
    if bias and prefix + ".bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[prefix + ".bias"], np.float32))
    return p


def _res_unit(sd, prefix):
    return {"conv1": _conv(sd, prefix + ".conv1.conv"),
            "conv2": _conv(sd, prefix + ".conv2")}


def import_autoencoder(sd: Dict[str, np.ndarray], cfg) -> dict:
    """Reference AudioDec Generator state_dict -> generator params pytree."""
    sd = fold_weight_norm(sd)
    enc = {"conv": _conv(sd, "encoder.conv.conv"), "blocks": []}
    for i in range(len(cfg.enc_strides)):
        pre = f"encoder.conv_blocks.{i}"
        enc["blocks"].append({
            "res": [_res_unit(sd, f"{pre}.res_units.{j}")
                    for j in range(len(cfg.res_dilations))],
            "conv": _conv(sd, f"{pre}.conv.conv"),
        })

    if "projector.project.conv.weight" in sd:
        proj = {"conv": _conv(sd, "projector.project.conv")}
    else:
        # conv1d_bn variant: Sequential(CausalConv1d, BatchNorm1d)
        # (ref: projector.py:39-47)
        proj = {
            "conv": _conv(sd, "projector.project.0.conv"),
            "bn": {
                "scale": jnp.asarray(sd["projector.project.1.weight"],
                                     jnp.float32),
                "bias": jnp.asarray(sd["projector.project.1.bias"],
                                    jnp.float32),
                "mean": jnp.asarray(sd["projector.project.1.running_mean"],
                                    jnp.float32),
                "var": jnp.asarray(sd["projector.project.1.running_var"],
                                   jnp.float32),
                "count": jnp.asarray(
                    sd["projector.project.1.num_batches_tracked"],
                    jnp.float32),
            },
        }

    embeds, cluster, avg = [], [], []
    for q in range(cfg.codebook_num):
        pre = f"quantizer.codebook.layers.{q}"
        embeds.append(np.asarray(sd[pre + ".embed"], np.float32).T)  # (N, D)
        cluster.append(np.asarray(sd[pre + ".cluster_size"], np.float32))
        avg.append(np.asarray(sd[pre + ".embed_avg"], np.float32).T)
    quant = {"embed": jnp.asarray(np.stack(embeds)),
             "cluster_size": jnp.asarray(np.stack(cluster)),
             "embed_avg": jnp.asarray(np.stack(avg))}

    dec = {"conv1": _conv(sd, "decoder.conv1.conv"), "blocks": []}
    for i in range(len(cfg.dec_strides)):
        if cfg.codec == "activate_audiodec":
            # ActivateDecoder wraps each block in Sequential(act, DecoderBlock)
            pre = f"decoder.conv_blocks.{i}.1"
        else:
            pre = f"decoder.conv_blocks.{i}"
        dec["blocks"].append({
            "conv": _convT(sd, f"{pre}.conv.deconv"),
            "res": [_res_unit(sd, f"{pre}.res_units.{j}")
                    for j in range(len(cfg.res_dilations))],
        })
    dec["conv2"] = _conv(sd, "decoder.conv2.conv")

    return {"encoder": enc, "projector": proj, "quantizer": quant,
            "decoder": dec}


def _conv_wn1d(sd, prefix):
    """Torch weight-normed Conv1d (weight_v (O,I,K), weight_g (O,1,1),
    dim=0) -> our {"v","g","b"} with both tensors permuted to (K,I,O); g
    lands at (1,1,O) so _resolve_weight_norm reduces (K,I) per output —
    exactly torch's dims != 0."""
    v = np.transpose(np.asarray(sd[prefix + ".weight_v"], np.float32),
                     (2, 1, 0))
    g = np.transpose(np.asarray(sd[prefix + ".weight_g"], np.float32),
                     (2, 1, 0))
    p = {"v": jnp.asarray(v), "g": jnp.asarray(g)}
    if prefix + ".bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[prefix + ".bias"], np.float32))
    return p


def _convT_wn1d(sd, prefix):
    """Torch weight-normed ConvTranspose1d (weight_v (I,O,K), weight_g
    (I,1,1), dim=0 = INPUT channels) -> our gathering (K,I,O) layout with
    the kernel flip applied to v; g lands at (1,I,1) (input axis
    preserved, matching apply_weight_norm_tree's transposed_paths)."""
    v = np.asarray(sd[prefix + ".weight_v"], np.float32)
    v = np.transpose(v[:, :, ::-1].copy(), (2, 0, 1))
    g = np.asarray(sd[prefix + ".weight_g"], np.float32)
    g = np.transpose(g, (2, 0, 1))
    p = {"v": jnp.asarray(v), "g": jnp.asarray(g)}
    if prefix + ".bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[prefix + ".bias"], np.float32))
    return p


def import_vocoder(sd: Dict[str, np.ndarray], cfg, fold: bool = True) -> dict:
    """Reference HiFiGAN Generator state_dict -> vocoder params pytree
    (key scheme per ref models/vocoder/HiFiGAN.py:84-123).

    fold=True folds torch weight_g/weight_v into plain kernels (inference);
    fold=False preserves the reparametrization as {"v","g","b"} dicts so
    optimizer trajectories over g/v match torch training exactly."""
    if fold:
        sd = fold_weight_norm(sd)
        conv, convT = _conv, _convT
    else:
        def conv(s, prefix, bias=True):
            return (_conv_wn1d(s, prefix) if prefix + ".weight_v" in s
                    else _conv(s, prefix, bias))

        def convT(s, prefix, bias=True):
            return (_convT_wn1d(s, prefix) if prefix + ".weight_v" in s
                    else _convT(s, prefix, bias))
    p = {
        "input_conv": conv(sd, "input_conv.conv"),
        "upsamples": [],
        "blocks": [],
        "output_conv": conv(sd, "output_conv.conv"),
    }
    for i in range(len(cfg.upsample_scales)):
        p["upsamples"].append(convT(sd, f"upsamples.{i}.deconv"))
        pre = f"blocks.{i}"
        if cfg.grouped:
            blk = {
                "convs1": [conv(sd, f"{pre}.convs1.{j}.conv")
                           for j in range(len(cfg.resblock_dilations[0]))],
                "conv_out": conv(sd, f"{pre}.conv_out"),
            }
            if cfg.use_additional_convs:
                blk["convs2"] = [
                    conv(sd, f"{pre}.convs2.{j}.conv")
                    for j in range(len(cfg.resblock_dilations[0]))]
            else:
                blk["convs2"] = []
            p["blocks"].append(blk)
        else:
            blocks = []
            for b in range(len(cfg.resblock_kernel_sizes)):
                blk = {
                    "convs1": [
                        conv(sd, f"{pre}.blocks.{b}.convs1.{j}.conv")
                        for j in range(len(cfg.resblock_dilations[b]))],
                    "convs2": [],
                }
                if cfg.use_additional_convs:
                    blk["convs2"] = [
                        conv(sd, f"{pre}.blocks.{b}.convs2.{j}.conv")
                        for j in range(len(cfg.resblock_dilations[b]))]
                blocks.append(blk)
            p["blocks"].append({"blocks": blocks})
    if "mean" in sd:
        p["mean"] = jnp.asarray(np.asarray(sd["mean"], np.float32))
        p["scale"] = jnp.asarray(np.asarray(sd["scale"], np.float32))
    return p


def _conv_wn(sd, prefix, ndim=3):
    """Map a torch weight-normed conv (weight_g/weight_v, dim=0) onto our
    {"v","g","b"} structure (ops/norms.py weight_norm_params layout): the
    same (K..., I, O) transpose applied to both tensors, g broadcast with
    the preserved output axis last."""
    perm = (2, 1, 0) if ndim == 3 else (2, 3, 1, 0)
    v = np.transpose(np.asarray(sd[prefix + ".weight_v"], np.float32), perm)
    g = np.transpose(np.asarray(sd[prefix + ".weight_g"], np.float32), perm)
    p = {"v": jnp.asarray(v), "g": jnp.asarray(g)}
    if prefix + ".bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[prefix + ".bias"], np.float32))
    return p


def import_hifigan_discriminator(sd: Dict[str, np.ndarray], cfg,
                                 fold: bool = True) -> dict:
    """Reference HiFiGAN MSD+MPD Discriminator state_dict -> params pytree.
    cfg: HiFiGANDiscriminatorConfig.

    fold=True (inference): plain weights, norms folded.
    fold=False (training parity): keeps the weight-norm (g, v)
    reparametrization so optimizer trajectories match torch, which trains
    weight_g/weight_v as separate Adam parameters."""
    if not fold:
        # MSD convs are PLAIN in the reference (its norm application is a
        # Conv2d-isinstance no-op on Conv1d stacks, ref discriminator.py:
        # 355-373); only the Conv2d-based MPD is weight-normed.
        msd = {"discriminators": []}
        n_scale_layers = len(cfg.msd.discriminator.layer_shapes())
        for i in range(cfg.msd.scales):
            layers = []
            for j in range(n_scale_layers):
                pre = f"msd.discriminators.{i}.layers.{j}"
                key = pre + (".conv" if j == n_scale_layers - 1
                             else ".0.conv")
                layers.append(_conv(sd, key))
            msd["discriminators"].append({"layers": layers})
        mpd = {"discriminators": []}
        n_period_layers = len(cfg.mpd.discriminator.layer_shapes())
        for i in range(len(cfg.mpd.periods)):
            pre = f"mpd.discriminators.{i}"
            layers = [_conv_wn(sd, f"{pre}.convs.{j}.0.conv", ndim=4)
                      for j in range(n_period_layers)]
            mpd["discriminators"].append({
                "layers": layers,
                "output_conv": _conv_wn(sd, f"{pre}.output_conv.conv",
                                        ndim=4),
            })
        return {"msd": msd, "mpd": mpd}
    sd = fold_weight_norm(sd)
    msd = {"discriminators": []}
    n_scale_layers = len(cfg.msd.discriminator.layer_shapes())
    for i in range(cfg.msd.scales):
        layers = []
        for j in range(n_scale_layers):
            pre = f"msd.discriminators.{i}.layers.{j}"
            # intermediate layers are Sequential(conv, act) -> ".0.conv"
            key = pre + (".conv" if j == n_scale_layers - 1 else ".0.conv")
            layers.append(_conv(sd, key))
        msd["discriminators"].append({"layers": layers})
    mpd = {"discriminators": []}
    n_period_layers = len(cfg.mpd.discriminator.layer_shapes())
    for i in range(len(cfg.mpd.periods)):
        pre = f"mpd.discriminators.{i}"
        layers = [_conv2d(sd, f"{pre}.convs.{j}.0.conv")
                  for j in range(n_period_layers)]
        mpd["discriminators"].append({
            "layers": layers,
            "output_conv": _conv2d(sd, f"{pre}.output_conv.conv"),
        })
    return {"msd": msd, "mpd": mpd}


def import_univnet_mrsd(sd: Dict[str, np.ndarray], cfg,
                        prefix: str = "") -> dict:
    """Reference UnivNetMultiResolutionSpectralDiscriminator state_dict ->
    params pytree (ref: discriminator.py:585-640).  cfg:
    MultiResolutionSpectralConfig.  `prefix` is 'mrsd.' when importing from
    the combined UnivNet Discriminator (ref: UnivNet.py:52-57)."""
    sd = fold_weight_norm(sd)
    n_layers = len(cfg.discriminator.layer_shapes())
    out = {"discriminators": []}
    for i in range(len(cfg.fft_sizes)):
        layers = []
        for j in range(n_layers):
            pre = f"{prefix}discriminators.{i}.layers.{j}"
            # intermediate layers are Sequential(conv2d, act) -> '.0.conv'
            key = pre + (".conv" if j == n_layers - 1 else ".0.conv")
            layers.append(_conv2d(sd, key))
        out["discriminators"].append({"layers": layers})
    return out


def import_univnet_discriminator(sd: Dict[str, np.ndarray], cfg) -> dict:
    """Reference UnivNet MRSD+MPD Discriminator state_dict -> params pytree.
    cfg: UnivNetDiscriminatorConfig."""
    sd = fold_weight_norm(sd)
    mrsd = import_univnet_mrsd(sd, cfg.mrsd, prefix="mrsd.")
    mpd = {"discriminators": []}
    n_period_layers = len(cfg.mpd.discriminator.layer_shapes())
    for i in range(len(cfg.mpd.periods)):
        pre = f"mpd.discriminators.{i}"
        layers = [_conv2d(sd, f"{pre}.convs.{j}.0.conv")
                  for j in range(n_period_layers)]
        mpd["discriminators"].append({
            "layers": layers,
            "output_conv": _conv2d(sd, f"{pre}.output_conv.conv"),
        })
    return {"mrsd": mrsd, "mpd": mpd}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a reference .pkl checkpoint (or raw state_dict) into numpy arrays.

    Accepts the trainer layout {'model': {'generator': sd, ...}, ...}
    (ref: trainer/trainerGAN.py:95-121) or a bare state_dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]
        obj = obj.get("generator", obj)
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}


def load_torch_meta(path: str) -> Dict[str, int]:
    """Training-progress metadata from a reference .pkl checkpoint: the
    reference persists `steps` AND `epochs` alongside the model
    (ref: trainer/trainerGAN.py:95-121); both ride our checkpoint header
    so an import -> resume -> save round-trip keeps them."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    meta = {}
    if isinstance(obj, dict):
        for k in ("steps", "epochs"):
            if k in obj:
                meta[k] = int(obj[k])
    return meta
