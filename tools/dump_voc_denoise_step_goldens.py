"""Dump one-step train parity goldens for the VOCODER and DENOISE trainers
by driving the reference's OWN trainers (same recipe as
tools/dump_train_step_golden.py, which covers the autoencoder trainer).

Vocoder (ref: trainer/vocoder.py:48-111): builds a small frozen symAD
analyzer checkpoint, a small weight-normed HiFiGAN generator with stats
input-normalization, and the small MSD+MPD discriminator; drives
trainer._train_step 4 times with generator_train_start_steps=0 and
discriminator_train_start_steps=1 so the schedule is
[no-op (strict `>` gating), metric, adv, adv].  Pins: analyzer freeze,
stats buffers never trained, weight-norm g/v Adam trajectories, StepLR
per-generator-update placement, MultiStepLR disc halving between the two
adv steps.

Denoise (ref: trainer/denoise.py:52-84): small symAD generator on
(noisy, clean) pair batches for 3 steps.  Pins: quantizer+decoder freeze,
codebook.eval() EMA stop, vq + mel loss assembly against the CLEAN target.

Outputs tests/golden/voc_train_step.npz and
tests/golden/denoise_train_step.npz.

Usage: python tools/dump_voc_denoise_step_goldens.py
"""

import os
import sys
import types

os.environ["PYTHONDONTWRITEBYTECODE"] = "1"
sys.dont_write_bytecode = True

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.ref_train import install_stubs, register_reference_packages  # noqa: E402

install_stubs()
sys.path.insert(0, "/root/reference")
register_reference_packages()

import numpy as np  # noqa: E402
import torch  # noqa: E402
import yaml  # noqa: E402

OUT = os.path.join(REPO, "tests", "golden")

GEN_PARAMS = {
    "input_channels": 1, "output_channels": 1,
    "encode_channels": 4, "decode_channels": 4,
    "code_dim": 16, "codebook_num": 4, "codebook_size": 32,
    "bias": True,
    "enc_ratios": [2, 4, 8, 16], "dec_ratios": [16, 8, 4, 2],
    "enc_strides": [3, 4, 5, 5], "dec_strides": [5, 5, 4, 3],
    "mode": "causal", "codec": "audiodec",
    "projector": "conv1d", "quantier": "residual_vq",
}

DISC_PARAMS = {
    "scales": 2,
    "follow_official_norm": False,
    "scale_discriminator_params": {
        "in_channels": 1, "out_channels": 1,
        "kernel_sizes": [15, 41, 5, 3], "channels": 16,
        "max_downsample_channels": 32, "max_groups": 4, "bias": True,
        "downsample_scales": [2, 2, 4, 4, 1],
        "nonlinear_activation": "LeakyReLU",
        "nonlinear_activation_params": {"negative_slope": 0.1},
    },
    "periods": [2, 3],
    "period_discriminator_params": {
        "in_channels": 1, "out_channels": 1, "kernel_sizes": [5, 3],
        "channels": 4, "downsample_scales": [3, 3, 3, 3, 1],
        "max_downsample_channels": 16, "bias": True,
        "nonlinear_activation": "LeakyReLU",
        "nonlinear_activation_params": {"negative_slope": 0.1},
        "use_weight_norm": True, "use_spectral_norm": False,
    },
}

LOSSES = {
    "use_mel_loss": True,
    "mel_loss_params": {
        "fs": 48000, "fft_sizes": [512], "hop_sizes": [150],
        "win_lengths": [512], "window": "hann_window", "num_mels": 16,
        "fmin": 0, "fmax": 24000, "log_base": None,
    },
    "use_stft_loss": False,
    "use_shape_loss": False,
    "use_feat_match_loss": True,
    "feat_match_loss_params": {"average_by_discriminators": False,
                               "average_by_layers": False},
    "generator_adv_loss_params": {"average_by_discriminators": False},
    "discriminator_adv_loss_params": {"average_by_discriminators": False},
    "lambda_adv": 1.0, "lambda_feat_match": 2.0, "lambda_vq_loss": 1.0,
    "lambda_mel_loss": 45.0,
}

OPTIM = {
    "generator_optimizer_type": "Adam",
    "generator_optimizer_params": {"lr": 1.0e-4, "betas": [0.5, 0.9],
                                   "weight_decay": 0.0},
    "generator_scheduler_type": "StepLR",
    "generator_scheduler_params": {"step_size": 1, "gamma": 0.5},
    "generator_grad_norm": -1,
    "discriminator_optimizer_type": "Adam",
    "discriminator_optimizer_params": {"lr": 2.0e-4, "betas": [0.5, 0.9],
                                       "weight_decay": 0.0},
    "discriminator_scheduler_type": "MultiStepLR",
    "discriminator_scheduler_params": {"milestones": [1], "gamma": 0.5},
    "discriminator_grad_norm": -1,
}


def sd_np(module):
    return {k: v.detach().cpu().numpy().copy()
            for k, v in module.state_dict().items()}


class _Tqdm:
    def update(self, n=1):
        pass


def build_train_main(cfg, tag, cfg_dir):
    import codecTrain

    cfg_path = os.path.join(cfg_dir, f"{tag}.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    args = types.SimpleNamespace(config=cfg_path, tag=tag, exp_root=cfg_dir,
                                 resume="", seed=1337, disable_cudnn="False")
    return codecTrain.TrainMain(args=args)


def make_analyzer_ckpt(cfg_dir):
    """Random-init small symAD analyzer saved in trainer checkpoint layout
    (ref: trainer/trainerGAN.py:95-121 model.generator sub-dict)."""
    from models.autoencoder.AudioDec import Generator as AEGenerator

    torch.manual_seed(7)
    analyzer = AEGenerator(**GEN_PARAMS)
    adir = os.path.join(cfg_dir, "analyzer")
    os.makedirs(adir, exist_ok=True)
    path = os.path.join(adir, "checkpoint-0steps.pkl")
    torch.save({"model": {"generator": analyzer.state_dict()}}, path)
    with open(os.path.join(adir, "config.yml"), "w") as f:
        yaml.safe_dump({"model_type": "symAudioDec",
                        "generator_params": GEN_PARAMS}, f)
    return path


def dump_vocoder(cfg_dir):
    analyzer_ckpt = make_analyzer_ckpt(cfg_dir)
    rng = np.random.default_rng(3)
    stats = np.stack([rng.standard_normal(16) * 0.1,
                      0.5 + rng.random(16)]).astype(np.float64)
    stats_path = os.path.join(cfg_dir, "stats.npy")
    np.save(stats_path, stats)

    cfg = {
        "model_type": "HiFiGAN",
        "train_mode": "vocoder",
        "data": {"path": "data/synth_ref",
                 "subset": {"train": "train", "valid": "valid",
                            "test": "test"}},
        "sampling_rate": 48000,
        "analyzer": analyzer_ckpt,
        "generator_params": {
            "in_channels": 16, "out_channels": 1, "channels": 32,
            "kernel_size": 7,
            "upsample_scales": [5, 5, 4, 3],
            "upsample_kernel_sizes": [10, 10, 8, 6],
            "resblock_kernel_sizes": [3],
            "resblock_dilations": [[1, 3]],
            "groups": 2, "bias": True, "use_additional_convs": True,
            "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.1},
            "use_weight_norm": True,
            "stats": stats_path,
        },
        "discriminator_params": DISC_PARAMS,
        "generator_train_start_steps": 0,
        "discriminator_train_start_steps": 1,
        "train_max_steps": 1000, "adv_train_max_steps": 1000,
        "batch_size": 2, "batch_length": 1200,
        **LOSSES, **OPTIM,
    }
    tm = build_train_main(cfg, "voc_step_golden", cfg_dir)
    tm.define_model()
    tm.define_criterion()
    tm.define_trainer()
    tm.initialize_model()   # loads the frozen analyzer
    trainer = tm.trainer
    trainer.tqdm = _Tqdm()

    n_calls = 4  # steps 0..3: no-op, metric, adv, adv
    rng = np.random.default_rng(42)
    batches = [0.3 * rng.standard_normal((2, 1, 1200)).astype(np.float32)
               for _ in range(n_calls)]

    out = {"x_all": np.stack(batches), "stats": stats}
    out.update({"sd0_gen__" + k: v
                for k, v in sd_np(tm.model["generator"]).items()})
    out.update({"sd0_disc__" + k: v
                for k, v in sd_np(tm.model["discriminator"]).items()})
    out.update({"sd_analyzer__" + k: v
                for k, v in sd_np(tm.model["analyzer"]).items()})

    for i, b in enumerate(batches):
        trainer._train_step(torch.tensor(b))
        if i == 1:  # after the single metric-phase update
            out.update({"sdm_gen__" + k: v
                        for k, v in sd_np(tm.model["generator"]).items()})
    out.update({"sda_gen__" + k: v
                for k, v in sd_np(tm.model["generator"]).items()})
    out.update({"sda_disc__" + k: v
                for k, v in sd_np(tm.model["discriminator"]).items()})

    np.savez_compressed(os.path.join(OUT, "voc_train_step.npz"), **out)
    print(f"voc_train_step golden: 1 no-op + 1 metric + 2 adv, "
          f"steps={trainer.steps}")


def dump_denoise(cfg_dir):
    cfg = {
        "model_type": "symAudioDec",
        "train_mode": "denoise",
        "data": {"path": "data/synth_ref",
                 "subset": {"clean_train": "train", "noisy_train": "train",
                            "clean_valid": "valid", "noisy_valid": "valid"}},
        "paradigm": "efficient",
        "sampling_rate": 48000,
        "generator_params": GEN_PARAMS,
        "discriminator_params": DISC_PARAMS,
        "train_max_steps": 1000, "adv_train_max_steps": 1000,
        "batch_size": 2, "batch_length": 1200,
        **LOSSES, **OPTIM,
    }
    # denoise runs 3 generator updates; step_size 2 pins mid-run lr halving
    cfg["generator_scheduler_params"] = {"step_size": 2, "gamma": 0.5}
    tm = build_train_main(cfg, "denoise_step_golden", cfg_dir)
    tm.define_model()
    tm.define_criterion()
    tm.define_trainer()
    trainer = tm.trainer
    trainer.tqdm = _Tqdm()

    n_steps = 3
    rng = np.random.default_rng(43)
    clean = [0.3 * rng.standard_normal((2, 1, 1200)).astype(np.float32)
             for _ in range(n_steps)]
    noisy = [c + 0.05 * rng.standard_normal(c.shape).astype(np.float32)
             for c in clean]

    out = {"x_noisy": np.stack(noisy), "x_clean": np.stack(clean)}
    out.update({"sd0_gen__" + k: v
                for k, v in sd_np(tm.model["generator"]).items()})

    for xn, xc in zip(noisy, clean):
        trainer._train_step((torch.tensor(xn), torch.tensor(xc)))
    out.update({"sd1_gen__" + k: v
                for k, v in sd_np(tm.model["generator"]).items()})
    out["n_steps"] = np.array(n_steps)

    np.savez_compressed(os.path.join(OUT, "denoise_train_step.npz"), **out)
    print(f"denoise_train_step golden: {n_steps} steps, "
          f"steps={trainer.steps}")


def main():
    import tempfile

    cfg_dir = tempfile.mkdtemp()
    dump_vocoder(cfg_dir)
    dump_denoise(cfg_dir)


if __name__ == "__main__":
    main()
