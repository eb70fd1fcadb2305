"""Multi-host (multi-process) runtime: 2 JAX processes over the distributed
runtime, global ('data','seq') mesh, cross-host chunk-halo transcode + DP
training (SURVEY.md §2.1, BASELINE.json "N>=2 hosts").

The heavy lifting lives in tools/multihost_probe.py and the codec_test CLI
(they must run in fresh processes with their own JAX backends); these tests
drive them end-to-end.
"""

import json
import os
import subprocess
import sys

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE = os.path.join(REPO, "tools", "multihost_probe.py")


def _clean_env(**extra):
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env.update(extra)
    return env


import pytest


@pytest.mark.parametrize("nprocs,devs,port", [(2, 2, "23981"),
                                              (4, 2, "23984")])
def test_multi_process_transcode_and_train(nprocs, devs, port):
    """2x2 and 4x2 process grids.  Each run covers: data-sharded cross-host
    transcode, a seq mesh whose shards + multi-hop halo chain
    (parallel/codec.py:92-99; 7209-sample halo over 600-sample shards)
    cross every process boundary, DP train steps, and post-step param
    synchronization."""
    out = subprocess.run(
        [sys.executable, PROBE, "--nprocs", str(nprocs),
         "--devices-per-proc", str(devs)],
        env=_clean_env(AUDIODEC_MH_PORT=port),
        capture_output=True, text=True, timeout=840)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "multihost_probe: OK" in out.stdout


def test_codec_test_cli_multihost(tmp_path):
    """codec_test CLI on 2 hosts x 2 devices: utterances data-sharded across
    hosts, time seq-sharded within each host; per-host output writing and
    aggregated RTF.  Outputs must match a single-process run to PCM16
    rounding."""
    from test_cli_e2e import TINY_CONFIG
    from audiodec_tpu.data import read_wav, write_wav
    from audiodec_tpu.models.autoencoder import GeneratorConfig, \
        generator_init
    from audiodec_tpu.train.checkpoint import save_checkpoint
    import jax

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    rng = np.random.default_rng(3)
    hop = 300
    for i in range(4):
        t = (8 + 2 * i) * hop
        x = (0.3 * rng.standard_normal((t, 1))).clip(-1, 1).astype(np.float32)
        write_wav(str(corpus / f"utt{i}.wav"), x, 48000)

    gp = TINY_CONFIG["generator_params"]
    cfg = GeneratorConfig(encode_channels=gp["encode_channels"],
                          decode_channels=gp["decode_channels"],
                          code_dim=gp["code_dim"],
                          codebook_num=gp["codebook_num"],
                          codebook_size=gp["codebook_size"])
    params = generator_init(jax.random.PRNGKey(0), cfg)
    ckpt = str(tmp_path / "exp" / "checkpoint-0.ckpt")
    save_checkpoint(ckpt, {"gen": params}, 0)
    with open(tmp_path / "exp" / "config.yml", "w") as f:
        yaml.safe_dump(dict(TINY_CONFIG), f)

    base = ["-m", "audiodec_tpu.bin.codec_test", "--encoder", ckpt,
            "--decoder", ckpt, "--data-path", str(corpus),
            "--batch-size", "4", "--stack", "xla"]

    out_single = str(tmp_path / "out_single")
    r = subprocess.run([sys.executable] + base + ["--outdir", out_single],
                       env=_clean_env(JAX_PLATFORMS="cpu"), cwd=REPO,
                       capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stdout + r.stderr

    out_mh = str(tmp_path / "out_mh")
    env = _clean_env(JAX_PLATFORMS="cpu",
                     XLA_FLAGS="--xla_force_host_platform_device_count=2")
    procs = [subprocess.Popen(
        [sys.executable] + base + [
            "--outdir", out_mh, "--seq", "2",
            "--coordinator", "localhost:23983",
            "--num-processes", "2", "--process-id", str(i)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(2)]
    outs = [p.communicate(timeout=540) for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    # Gloo sometimes appends its connection banner to the same stdout line
    # as our JSON; raw_decode tolerates trailing junk
    stats = json.JSONDecoder().raw_decode(
        [l for l in outs[0][0].splitlines() if l.startswith("{")][-1])[0]
    assert stats["hosts"] == 2 and stats["utterances"] == 4

    for i in range(4):
        y1, _ = read_wav(os.path.join(out_single, f"utt{i}_output.wav"))
        y2, _ = read_wav(os.path.join(out_mh, f"utt{i}_output.wav"))
        # identical math; PCM16 quantization may flip the last bit on
        # f32-rounding ties
        np.testing.assert_allclose(y1, y2, atol=1.01 / 32767.0)


def test_codec_train_cli_multihost(tmp_path):
    """codec_train CLI on 2 hosts x 1 device: psum'd grads + EMA stats make
    2-host training equal single-host --dp 2 training at the same global
    batch; only the primary host writes checkpoints/metrics."""
    from test_cli_e2e import TINY_CONFIG
    from audiodec_tpu.data import write_wav
    from audiodec_tpu.train.checkpoint import load_checkpoint

    rng = np.random.default_rng(5)
    for sub in ("train", "valid"):
        d = tmp_path / "corpus" / sub
        d.mkdir(parents=True)
        for i in range(3):
            x = (0.3 * rng.standard_normal((2400, 1))).clip(-1, 1).astype(
                np.float32)
            write_wav(str(d / f"{sub}{i}.wav"), x, 48000)

    cfg = dict(TINY_CONFIG)
    cfg["data"] = {"path": str(tmp_path / "corpus"),
                   "subset": {"train": "train", "valid": "valid",
                              "test": "valid"}}
    cfg["train_max_steps"] = 2
    cfg["adv_train_max_steps"] = 3
    cfg["start_steps"] = {"generator": 0, "discriminator": 2}
    cfg["eval_interval_steps"] = 100
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    # single-process reference: --dp 2 on 2 virtual devices
    tag_1p = str(tmp_path / "exp_1p")
    r = subprocess.run(
        [sys.executable, "-m", "audiodec_tpu.bin.codec_train",
         "--config", cfg_path, "--tag", tag_1p, "--dp", "2"],
        env=_clean_env(JAX_PLATFORMS="cpu",
                       XLA_FLAGS="--xla_force_host_platform_device_count=2"),
        cwd=REPO, capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stdout + r.stderr

    # two processes, one device each, same global batch.  No retry:
    # init_distributed now opens a 300s rendezvous window, which covers the
    # loaded-host cold-start that used to flake Gloo's default 60s.
    tag_2p = str(tmp_path / "exp_2p")
    procs = [subprocess.Popen(
        [sys.executable, "-m", "audiodec_tpu.bin.codec_train",
         "--config", cfg_path, "--tag", tag_2p,
         "--coordinator", "localhost:23987",
         "--num-processes", "2", "--process-id", str(i)],
        env=_clean_env(JAX_PLATFORMS="cpu"), cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    assert all(p.returncode == 0 for p in procs), outs

    s1, h1 = load_checkpoint(os.path.join(tag_1p, "checkpoint-final.ckpt"))
    s2, h2 = load_checkpoint(os.path.join(tag_2p, "checkpoint-final.ckpt"))
    assert h1["steps"] == h2["steps"] == 3
    import jax
    leaves1 = jax.tree_util.tree_leaves(s1["gen"])
    leaves2 = jax.tree_util.tree_leaves(s2["gen"])
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=2e-4, atol=2e-5)
