"""End-to-end CLI pipeline on a synthetic corpus: train a tiny autoencoder,
extract stats, batch transcode, file demo, simulated streaming demo —
the submit_codec_vctk.sh stage pipeline in miniature (ref stages 0-4)."""

import json
import os

import numpy as np
import pytest
import yaml

from audiodec_tpu.data import write_wav

TINY_CONFIG = {
    "sampling_rate": 48000,
    "model_type": "symAudioDec",
    "train_mode": "autoencoder",
    "paradigm": "efficient",
    "generator_params": {
        "input_channels": 1, "output_channels": 1,
        "encode_channels": 2, "decode_channels": 2, "code_dim": 8,
        "codebook_num": 2, "codebook_size": 16, "bias": True,
        "enc_ratios": [2, 4, 8, 16], "dec_ratios": [16, 8, 4, 2],
        "enc_strides": [3, 4, 5, 5], "dec_strides": [5, 5, 4, 3],
        "mode": "causal", "codec": "audiodec", "projector": "conv1d",
        "quantier": "residual_vq",
    },
    "discriminator_params": {
        "scales": 2,
        "scale_downsample_pooling_params": {
            "kernel_size": 4, "stride": 2, "padding": 2},
        "scale_discriminator_params": {
            "channels": 16, "max_downsample_channels": 32, "max_groups": 4,
            "kernel_sizes": [15, 41, 5, 3],
            "downsample_scales": [2, 2, 4, 4, 1]},
        "follow_official_norm": False,
        "periods": [2, 3],
        "period_discriminator_params": {
            "channels": 4, "max_downsample_channels": 16,
            "kernel_sizes": [5, 3], "downsample_scales": [3, 3, 3, 3, 1]},
    },
    "use_mel_loss": True,
    "mel_loss_params": {"fs": 48000, "fft_sizes": [512], "hop_sizes": [150],
                        "win_lengths": [512], "num_mels": 16, "fmin": 0,
                        "fmax": 24000, "log_base": None},
    "use_feat_match_loss": True,
    "lambda_adv": 1.0, "lambda_feat_match": 2.0, "lambda_vq_loss": 1.0,
    "lambda_mel_loss": 45.0,
    "batch_size": 2, "batch_length": 1200, "adv_batch_length": 1200,
    "num_workers": 1,
    "generator_optimizer_type": "Adam",
    "generator_optimizer_params": {"lr": 1e-3, "betas": [0.5, 0.9]},
    "generator_scheduler_type": "StepLR",
    "generator_scheduler_params": {"step_size": 100000, "gamma": 1.0},
    "generator_grad_norm": -1,
    "discriminator_optimizer_type": "Adam",
    "discriminator_optimizer_params": {"lr": 2e-4, "betas": [0.5, 0.9]},
    "discriminator_scheduler_type": "MultiStepLR",
    "discriminator_scheduler_params": {"gamma": 0.5, "milestones": [100000]},
    "discriminator_grad_norm": -1,
    "start_steps": {"generator": 0, "discriminator": 4},
    "train_max_steps": 4, "adv_train_max_steps": 8,
    "save_interval_steps": 1000, "eval_interval_steps": 6,
    "log_interval_steps": 2,
}


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)
    for sub in ("train", "valid", "test"):
        d = root / "corpus" / sub
        d.mkdir(parents=True)
        for i in range(3):
            t = 2400 + 600 * i
            x = (0.3 * rng.standard_normal((t, 1))).clip(-1, 1).astype(
                np.float32)
            write_wav(str(d / f"{sub}{i}.wav"), x, 48000)
    cfg = dict(TINY_CONFIG)
    cfg["data"] = {"path": str(root / "corpus"),
                   "subset": {"train": "train", "valid": "valid",
                              "test": "test"}}
    cfg_path = root / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return root, str(cfg_path)


def test_train_stats_test_demo_pipeline(workdir):
    root, cfg_path = workdir
    tag = str(root / "exp" / "tiny")

    # stage 0: train (4 metric steps + 4 adversarial steps)
    from audiodec_tpu.bin import codec_train
    codec_train.main(["--config", cfg_path, "--tag", tag])
    final = os.path.join(tag, "checkpoint-final.ckpt")
    assert os.path.exists(final)
    assert os.path.exists(os.path.join(tag, "config.yml"))
    assert os.path.exists(os.path.join(tag, "metrics.jsonl"))
    with open(os.path.join(tag, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    train_keys = set(k for r in recs for k in r)
    assert any("discriminator_loss" in k for k in train_keys)
    assert any(k.startswith("eval/") for k in train_keys)

    # stage 1: stats extraction
    from audiodec_tpu.bin import codec_stats
    stats_cfg = {"sampling_rate": 48000,
                 "data": yaml.safe_load(open(cfg_path))["data"],
                 "analyzer": final,
                 "stats": str(root / "stats.npy")}
    stats_cfg_path = str(root / "stats_config.yaml")
    with open(stats_cfg_path, "w") as f:
        yaml.safe_dump(stats_cfg, f)
    codec_stats.main(["--config", stats_cfg_path])
    stats = np.load(str(root / "stats.npy"))
    assert stats.shape == (2, 8) and np.all(np.isfinite(stats))

    # stage 3: batch transcode with RTF accounting
    from audiodec_tpu.bin import codec_test
    outdir = str(root / "out")
    codec_test.main(["--encoder", final, "--decoder", final,
                     "--subset", "test", "--outdir", outdir,
                     "--batch-size", "2"])
    outs = os.listdir(outdir)
    assert len([f for f in outs if f.endswith("_output.wav")]) == 3

    # mixed dtype (bf16 decoder) + host-float I/O path: runs end-to-end and
    # writes every utterance (index identity vs f32 is pinned in
    # test_fast_paths)
    outdir_m = str(root / "out_mixed")
    codec_test.main(["--encoder", final, "--decoder", final,
                     "--subset", "test", "--outdir", outdir_m,
                     "--batch-size", "2", "--dtype", "mixed",
                     "--float-in", "--float-out"])
    assert len([f for f in os.listdir(outdir_m)
                if f.endswith("_output.wav")]) == 3

    # demo: file codec roundtrip + bitstream output
    from audiodec_tpu.bin import demo_file
    in_wav = str(root / "corpus" / "test" / "test0.wav")
    out_wav = str(root / "demo_out.wav")
    codes_out = str(root / "demo.adtc")
    demo_file.main(["--encoder", final, "--decoder", final,
                    "-i", in_wav, "-o", out_wav, "--codes-out", codes_out])
    from audiodec_tpu.utils.bitstream import unpack_codes
    idx, info = unpack_codes(open(codes_out, "rb").read())
    assert info["num_q"] == 2 and idx.shape[1] == 2
    from audiodec_tpu.data import read_wav
    y, sr = read_wav(out_wav)
    x, _ = read_wav(in_wav)
    assert sr == 48000 and len(y) == len(x)

    # decode-from-bitstream leg: --codes-in reproduces the transcode output
    dec_wav = str(root / "demo_dec.wav")
    demo_file.main(["--encoder", final, "--decoder", final,
                    "--codes-in", codes_out, "-o", dec_wav])
    yd, _ = read_wav(dec_wav)
    np.testing.assert_array_equal(yd[:len(y)], y)


def test_data_parallel_training(workdir):
    """--dp 2: shard_map-wrapped GAN steps over a 2-device data mesh."""
    root, cfg_path = workdir
    from audiodec_tpu.bin import codec_train
    tag = str(root / "exp" / "dp2")
    codec_train.main(["--config", cfg_path, "--tag", tag, "--dp", "2"])
    assert os.path.exists(os.path.join(tag, "checkpoint-final.ckpt"))
    with open(os.path.join(tag, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    keys = set(k for r in recs for k in r)
    assert any("discriminator_loss" in k for k in keys)


def test_denoise_training_pipeline(workdir):
    """Denoise mode: pair corpus, warm start from the AE checkpoint, no
    adversarial stage (ref: trainer/denoise.py, config/denoise)."""
    root, cfg_path = workdir
    ae_final = str(root / "exp" / "tiny" / "checkpoint-final.ckpt")
    cfg = yaml.safe_load(open(cfg_path))
    cfg["train_mode"] = "denoise"
    cfg["initial"] = ae_final
    base = cfg["data"]["path"]
    cfg["data"]["subset"] = {
        "clean_train": "train", "clean_valid": "valid", "clean_test": "test",
        "noisy_train": "train", "noisy_valid": "valid", "noisy_test": "test",
    }
    cfg["train_max_steps"] = 3
    cfg["adv_train_max_steps"] = 3
    cfg["eval_interval_steps"] = 2
    dn_cfg_path = str(root / "denoise_config.yaml")
    with open(dn_cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from audiodec_tpu.bin import codec_train
    tag = str(root / "exp" / "denoise")
    codec_train.main(["--config", dn_cfg_path, "--tag", tag])
    assert os.path.exists(os.path.join(tag, "checkpoint-final.ckpt"))

    # warm start actually loaded the AE weights
    import jax
    from audiodec_tpu.train.checkpoint import load_checkpoint
    import numpy as np_
    ae_state, _ = load_checkpoint(ae_final)
    dn_state, _ = load_checkpoint(os.path.join(tag,
                                               "checkpoint-final.ckpt"))
    # decoder frozen in denoise mode == identical to AE decoder weights
    a = ae_state["gen"]["decoder"]["conv1"]["w"]
    b = dn_state["gen"]["decoder"]["conv1"]["w"]
    np_.testing.assert_array_equal(np_.asarray(a), np_.asarray(b))


def test_codec_serve_stdin(workdir, monkeypatch, capsys):
    """codec_serve --stdin: persistent transcoder produces files identical
    to codec_test for the same checkpoint and prints one JSON per input."""
    import io
    import sys as _sys

    root, cfg_path = workdir
    final = os.path.join(str(root / "exp" / "tiny"), "checkpoint-final.ckpt")
    ct_out = str(root / "out")
    if not os.path.exists(final):  # standalone invocation
        from audiodec_tpu.bin import codec_train
        codec_train.main(["--config", cfg_path,
                          "--tag", str(root / "exp" / "tiny")])
    if not os.path.isdir(ct_out):
        from audiodec_tpu.bin import codec_test
        codec_test.main(["--encoder", final, "--decoder", final,
                         "--subset", "test", "--outdir", ct_out,
                         "--batch-size", "2"])
    wavs = sorted(
        str(root / "corpus" / "test" / f) for f in
        os.listdir(root / "corpus" / "test") if f.endswith(".wav"))
    outdir = str(root / "serve_out")

    from audiodec_tpu.bin import codec_serve
    capsys.readouterr()  # drop bootstrap output (codec_test summary JSON)
    monkeypatch.setattr(_sys, "stdin", io.StringIO("\n".join(wavs) + "\n"))
    codec_serve.main(["--encoder", final, "--decoder", final,
                      "--outdir", outdir, "--stdin", "--dtype", "float32",
                      "--warmup-seconds", "0", "--batch-size", "2"])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert len(lines) == 3
    outs = sorted(os.listdir(outdir))
    assert outs == [os.path.basename(w).replace(".wav", "_output.wav")
                    for w in wavs]

    # identical bytes to the codec_test output of the same checkpoint
    for f in outs:
        with open(os.path.join(outdir, f), "rb") as a, \
                open(os.path.join(ct_out, f), "rb") as b:
            assert a.read() == b.read()


def test_codec_serve_precision_exact_matches_codec_test(workdir, monkeypatch,
                                                        capsys):
    """--precision exact on the serving surface: codec_serve and codec_test
    produce byte-identical outputs for the same checkpoint under the
    recommended parity mode (encoder 'high' + two-pass argmin), so a
    server wanting hardware bit-exactness no longer has to fall back to
    the 2.6x 'highest' mode."""
    import io
    import sys as _sys

    root, cfg_path = workdir
    final = os.path.join(str(root / "exp" / "tiny"), "checkpoint-final.ckpt")
    if not os.path.exists(final):  # standalone invocation
        from audiodec_tpu.bin import codec_train
        codec_train.main(["--config", cfg_path,
                          "--tag", str(root / "exp" / "tiny")])
    ct_out = str(root / "out_exact")
    from audiodec_tpu.bin import codec_test
    codec_test.main(["--encoder", final, "--decoder", final,
                     "--subset", "test", "--outdir", ct_out,
                     "--batch-size", "2", "--dtype", "mixed",
                     "--precision", "exact"])
    wavs = sorted(
        str(root / "corpus" / "test" / f) for f in
        os.listdir(root / "corpus" / "test") if f.endswith(".wav"))
    outdir = str(root / "serve_out_exact")

    from audiodec_tpu.bin import codec_serve
    capsys.readouterr()
    monkeypatch.setattr(_sys, "stdin", io.StringIO("\n".join(wavs) + "\n"))
    codec_serve.main(["--encoder", final, "--decoder", final,
                      "--outdir", outdir, "--stdin", "--dtype", "mixed",
                      "--precision", "exact",
                      "--warmup-seconds", "0", "--batch-size", "2"])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert len(lines) == 3
    outs = sorted(os.listdir(outdir))
    assert len(outs) == 3
    for f in outs:
        with open(os.path.join(outdir, f), "rb") as a, \
                open(os.path.join(ct_out, f), "rb") as b:
            assert a.read() == b.read()


def _write_float_wav(path, x, sr):
    """Minimal IEEE-float32 (format tag 3) WAV writer for test inputs."""
    import struct
    x = np.asarray(x, np.float32)
    if x.ndim == 1:
        x = x[:, None]
    ch = x.shape[1]
    payload = x.astype("<f4").tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, ch, sr,
                                      sr * ch * 4, ch * 4, 32))
        f.write(b"data" + struct.pack("<I", len(payload)))
        f.write(payload)


def test_codec_serve_robustness(workdir, monkeypatch, capsys):
    """codec_serve survives bad inputs (JSON error lines, no crash),
    normalizes PCM16 rows inside a mixed PCM16/float batch, and rejects
    wrong-sample-rate / mismatched-channel files."""
    import io
    import sys as _sys
    from audiodec_tpu.data import read_wav

    root, cfg_path = workdir
    final = os.path.join(str(root / "exp" / "tiny"), "checkpoint-final.ckpt")
    ct_out = str(root / "out")
    if not os.path.exists(final):  # standalone invocation
        from audiodec_tpu.bin import codec_train
        codec_train.main(["--config", cfg_path,
                          "--tag", str(root / "exp" / "tiny")])
    if not os.path.isdir(ct_out):
        from audiodec_tpu.bin import codec_test
        codec_test.main(["--encoder", final, "--decoder", final,
                         "--subset", "test", "--outdir", ct_out,
                         "--batch-size", "2"])

    src_i16 = str(root / "corpus" / "test" / "test0.wav")
    src_mono2 = str(root / "corpus" / "test" / "test1.wav")
    x, _ = read_wav(src_i16)
    f32_wav = str(root / "serve_f32.wav")
    _write_float_wav(f32_wav, x, 48000)  # float row next to a PCM16 row
    bad_sr = str(root / "serve_badsr.wav")
    write_wav(bad_sr, x, 16000)
    garbage = str(root / "serve_garbage.wav")
    with open(garbage, "wb") as f:
        f.write(b"definitely not a RIFF file")
    missing = str(root / "serve_missing.wav")
    stereo = str(root / "serve_stereo.wav")
    write_wav(stereo, np.repeat(x, 2, axis=1), 48000)

    # arrival order fixes the micro-batches (batch-size 2):
    #   [i16, f32] mixed-dtype batch; [mono2, stereo] channel mismatch;
    #   [bad_sr, garbage] all-error batch; [missing] final partial flush
    feed = [src_i16, f32_wav, src_mono2, stereo, bad_sr, garbage, missing]
    outdir = str(root / "serve_robust_out")
    from audiodec_tpu.bin import codec_serve
    capsys.readouterr()
    monkeypatch.setattr(_sys, "stdin", io.StringIO("\n".join(feed) + "\n"))
    codec_serve.main(["--encoder", final, "--decoder", final,
                      "--outdir", outdir, "--stdin", "--dtype", "float32",
                      "--warmup-seconds", "0", "--batch-size", "2"])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    by_input = {l["input"]: l for l in lines}
    assert len(lines) == len(feed)

    # errors reported per file, server kept going
    assert "sample rate" in by_input[bad_sr]["error"]
    assert "read failed" in by_input[garbage]["error"]
    assert "read failed" in by_input[missing]["error"]
    assert "channel count" in by_input[stereo]["error"]
    for good in (src_i16, f32_wav, src_mono2):
        assert "output" in by_input[good], by_input[good]

    # the PCM16 row of the mixed batch was normalized: byte-identical to
    # the codec_test output; the float row carries the same samples so it
    # must match too
    ref = open(os.path.join(ct_out, "test0_output.wav"), "rb").read()
    a = open(os.path.join(outdir, "test0_output.wav"), "rb").read()
    b = open(os.path.join(outdir, "serve_f32_output.wav"), "rb").read()
    assert a == ref
    assert b == ref


def test_codec_serve_watch(workdir):
    """codec_serve --watch: files dropped into a directory are transcoded;
    the .stop marker shuts the server down cleanly."""
    import shutil
    import threading
    import time as _time

    root, cfg_path = workdir
    final = os.path.join(str(root / "exp" / "tiny"), "checkpoint-final.ckpt")
    if not os.path.exists(final):  # standalone invocation
        from audiodec_tpu.bin import codec_train
        codec_train.main(["--config", cfg_path,
                          "--tag", str(root / "exp" / "tiny")])
    watch = str(root / "watch_in")
    outdir = str(root / "watch_out")
    os.makedirs(watch, exist_ok=True)
    src = str(root / "corpus" / "test" / "test0.wav")

    def feeder():
        shutil.copy(src, os.path.join(watch, "job.wav"))
        deadline = _time.monotonic() + 120
        out = os.path.join(outdir, "job_output.wav")
        while _time.monotonic() < deadline and not os.path.exists(out):
            _time.sleep(0.1)
        open(os.path.join(watch, ".stop"), "w").close()

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    from audiodec_tpu.bin import codec_serve
    codec_serve.main(["--encoder", final, "--decoder", final,
                      "--outdir", outdir, "--watch", watch, "--poll", "0.1",
                      "--dtype", "float32", "--warmup-seconds", "0",
                      "--linger", "0.05"])
    t.join(timeout=10)
    assert os.path.exists(os.path.join(outdir, "job_output.wav"))


def test_codec_serve_watch_rotation_bounded_state(workdir):
    """Long-lived watch server: a deleted-then-recreated input transcodes
    again (watch state is pruned to the directory's contents, not
    accumulated forever), and its output is overwritten in place."""
    import shutil
    import threading
    import time as _time

    root, cfg_path = workdir
    final = os.path.join(str(root / "exp" / "tiny"), "checkpoint-final.ckpt")
    if not os.path.exists(final):  # standalone invocation
        from audiodec_tpu.bin import codec_train
        codec_train.main(["--config", cfg_path,
                          "--tag", str(root / "exp" / "tiny")])
    watch = str(root / "watch_rot_in")
    outdir = str(root / "watch_rot_out")
    os.makedirs(watch, exist_ok=True)
    src_a = str(root / "corpus" / "test" / "test0.wav")
    src_b = str(root / "corpus" / "test" / "test1.wav")
    out = os.path.join(outdir, "rot_output.wav")

    def wait_for(pred, deadline_s=120):
        deadline = _time.monotonic() + deadline_s
        while _time.monotonic() < deadline:
            if pred():
                return True
            _time.sleep(0.1)
        return False

    results = {}

    def feeder():
        shutil.copy(src_a, os.path.join(watch, "rot.wav"))
        if wait_for(lambda: os.path.exists(out)):
            results["first"] = open(out, "rb").read()
            # rotate: delete + recreate the same name with NEW content;
            # the server must pick it up again and overwrite the output
            os.remove(os.path.join(watch, "rot.wav"))
            _time.sleep(0.4)  # let a poll observe the deletion
            shutil.copy(src_b, os.path.join(watch, "rot.wav"))
            wait_for(lambda: os.path.exists(out)
                     and open(out, "rb").read() != results["first"])
            results["second"] = open(out, "rb").read()
        open(os.path.join(watch, ".stop"), "w").close()

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    from audiodec_tpu.bin import codec_serve
    codec_serve.main(["--encoder", final, "--decoder", final,
                      "--outdir", outdir, "--watch", watch, "--poll", "0.1",
                      "--dtype", "float32", "--warmup-seconds", "0",
                      "--linger", "0.05"])
    t.join(timeout=10)
    assert "first" in results and "second" in results
    assert results["second"] != results["first"]


def test_codec_serve_output_name_collision(workdir, monkeypatch, capsys):
    """Two different inputs sharing a basename (different directories) must
    not overwrite each other's auto-named output; the same input
    re-transcoded keeps its output path."""
    import io
    import shutil
    import sys as _sys

    root, cfg_path = workdir
    final = os.path.join(str(root / "exp" / "tiny"), "checkpoint-final.ckpt")
    if not os.path.exists(final):  # standalone invocation
        from audiodec_tpu.bin import codec_train
        codec_train.main(["--config", cfg_path,
                          "--tag", str(root / "exp" / "tiny")])
    d1 = root / "coll_a"
    d2 = root / "coll_b"
    d1.mkdir(exist_ok=True)
    d2.mkdir(exist_ok=True)
    shutil.copy(str(root / "corpus" / "test" / "test0.wav"),
                str(d1 / "same.wav"))
    shutil.copy(str(root / "corpus" / "test" / "test1.wav"),
                str(d2 / "same.wav"))
    feed = [str(d1 / "same.wav"), str(d2 / "same.wav"),
            str(d1 / "same.wav")]  # repeat: same src keeps its path
    outdir = str(root / "coll_out")

    from audiodec_tpu.bin import codec_serve
    capsys.readouterr()
    monkeypatch.setattr(_sys, "stdin", io.StringIO("\n".join(feed) + "\n"))
    codec_serve.main(["--encoder", final, "--decoder", final,
                      "--outdir", outdir, "--stdin", "--dtype", "float32",
                      "--warmup-seconds", "0", "--batch-size", "2"])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    outs = [l["output"] for l in lines if "output" in l]
    assert len(outs) == 3
    assert outs[0] == os.path.join(outdir, "same_output.wav")
    assert outs[1] == os.path.join(outdir, "same_output.2.wav")
    assert outs[2] == outs[0]  # same source re-transcoded -> same path
    assert sorted(os.listdir(outdir)) == ["same_output.2.wav",
                                          "same_output.wav"]


def test_int8_mesh_fallback_keeps_folded_decoder():
    """--int8-decode under a mesh downgrades to the NORMAL (folded when
    eligible) decoder, not a fully-direct one: the int8 downgrade happens
    BEFORE the fold-eligibility checks (round-4 advisor finding)."""
    import warnings

    import jax
    import jax.numpy as jnp

    from audiodec_tpu.bin.codec_test import BatchTranscoder
    from audiodec_tpu.models.autoencoder import (
        GeneratorConfig,
        generator_init,
    )
    from audiodec_tpu.parallel import make_mesh

    cfg = GeneratorConfig(encode_channels=2, decode_channels=2, code_dim=8,
                          codebook_num=2, codebook_size=16)
    params = generator_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(data=2, seq=1)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        tc = BatchTranscoder(params, cfg, mesh=mesh,
                             dtype=jnp.float32, dec_dtype=jnp.bfloat16,
                             int8_decode=True)
        assert any("int8-decode cannot be honored" in str(x.message)
                   for x in w)
    assert tc.fold_policy["int8_decode"] is False
    assert tc.fold_policy["dec_fold"] is True   # folded fallback
    assert tc.fold_policy["enc_fold"] is True

    # fold factor 1 means DIRECT, never auto (identity-check fix)
    from audiodec_tpu.bin.codec_test import _fold_arg
    assert _fold_arg(1) == 1 and _fold_arg(True) is None \
        and _fold_arg(None) is None and _fold_arg(8) == 8


def test_audiodec_platform_env_override():
    """AUDIODEC_PLATFORM=cpu forces the CLI backend to CPU via
    enable_compile_cache (the axon TPU plugin ignores the JAX_PLATFORMS
    env var, so this config-level hook is the only way to CPU-run a CLI
    in a fresh process while the chip is busy)."""
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["AUDIODEC_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c",
         "from audiodec_tpu.utils.profiling import enable_compile_cache;"
         "enable_compile_cache();"
         "import jax; print('backend=' + jax.default_backend())"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "backend=cpu" in r.stdout
