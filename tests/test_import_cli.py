"""End-to-end torch-checkpoint import through the tools/import_ckpt.py CLI.

Repacks the golden symAD state dict (dumped from the real reference torch
code by tools/make_golden.py) as a torch .pkl in the reference trainer's
checkpoint layout (ref: trainer/trainerGAN.py:95-121), runs the importer
CLI, and verifies the resulting framework checkpoint reproduces the
reference's RVQ indices bit-exactly through codec_test's transcoder.
"""

import os
import subprocess
import sys

import numpy as np

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "tests", "golden", "gen_symad.npz")


def test_import_ckpt_cli_roundtrip(tmp_path):
    import torch

    data = np.load(GOLDEN)
    sd = {k[len("sd__"):]: torch.from_numpy(data[k]) for k in data.files
          if k.startswith("sd__")}
    pkl = str(tmp_path / "checkpoint-200000steps.pkl")
    torch.save({"model": {"generator": sd}, "steps": 200000}, pkl)

    cfg_path = str(tmp_path / "config.yml")
    with open(os.path.join(REPO, "configs", "autoencoder",
                           "symAD_vctk_48000_hop300.yaml")) as f:
        cfg = yaml.safe_load(f)
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    out = str(tmp_path / "exp" / "checkpoint-200000steps.ckpt")
    r = subprocess.run(
        [sys.executable, "tools/import_ckpt.py", "--torch", pkl,
         "--config", cfg_path, "--out", out],
        cwd=REPO, capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stdout + r.stderr
    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / "exp" / "config.yml"))

    # the imported checkpoint reproduces the reference's indices bit-exactly
    import jax.numpy as jnp
    from audiodec_tpu.bin.codec_test import BatchTranscoder
    from audiodec_tpu.train.checkpoint import load_only_params
    from audiodec_tpu.models.autoencoder import (GeneratorConfig,
                                                 generator_init)
    import jax

    cfg_g = GeneratorConfig()
    template = generator_init(jax.random.PRNGKey(0), cfg_g)
    params, _ = load_only_params(out, "gen", template=template)
    tr = BatchTranscoder(params, cfg_g, stack="xla")
    x = jnp.asarray(data["x"].transpose(0, 2, 1))
    idx, y = tr(np.asarray(x))
    # idx: (B, frames, Q) non-flattened; golden idx_stream is flattened
    # (Q, frames) with per-layer offsets of layer*codebook_size
    q = cfg_g.codebook_num
    offs = (np.arange(q) * cfg_g.codebook_size)[None, None, :]
    np.testing.assert_array_equal(
        (np.asarray(idx[0]) + offs[0]).T, data["idx_stream"])
