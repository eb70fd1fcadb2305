"""Dump a train-step parity golden by driving the reference's OWN trainer.

Builds the reference models/criteria/optimizers/trainer exactly as
codecTrain.py does (TrainMain), then calls trainer._train_step on fixed
batches: 3 metric-phase steps followed by 2 adversarial-phase steps
(discriminator start = 3, 'efficient' paradigm freeze engages).  Dumps the
initial state dicts, the batches, and the post-step state dicts after the
metric phase and after the adversarial phase to
tests/golden/train_step.npz.

The paired test (tests/test_train_step_parity.py) replays the same
schedule through our make_autoencoder_steps + make_optimizer and asserts
the updated generator/discriminator parameters match — pinning Adam
semantics, scheduler step placement, λ-weighted loss assembly, freezing,
and EMA codebook updates through real backprop.

Usage: python tools/dump_train_step_golden.py
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

CONFIG = {
    "model_type": "symAudioDec",
    "train_mode": "autoencoder",
    "data": {"path": "data/synth_ref",
             "subset": {"train": "train", "valid": "valid", "test": "test"}},
    "paradigm": "efficient",
    "sampling_rate": 48000,
    "generator_params": {
        "input_channels": 1, "output_channels": 1,
        "encode_channels": 4, "decode_channels": 4,
        "code_dim": 16, "codebook_num": 4, "codebook_size": 32,
        "bias": True,
        "enc_ratios": [2, 4, 8, 16], "dec_ratios": [16, 8, 4, 2],
        "enc_strides": [3, 4, 5, 5], "dec_strides": [5, 5, 4, 3],
        "mode": "causal", "codec": "audiodec",
        "projector": "conv1d", "quantier": "residual_vq",
    },
    "discriminator_params": {
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
    },
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
    "generator_optimizer_type": "Adam",
    "generator_optimizer_params": {"lr": 1.0e-4, "betas": [0.5, 0.9],
                                   "weight_decay": 0.0},
    "generator_scheduler_type": "StepLR",
    # step_size 2 so the gen lr actually changes inside the run
    "generator_scheduler_params": {"step_size": 2, "gamma": 0.5},
    "generator_grad_norm": -1,
    "discriminator_optimizer_type": "Adam",
    "discriminator_optimizer_params": {"lr": 2.0e-4, "betas": [0.5, 0.9],
                                       "weight_decay": 0.0},
    "discriminator_scheduler_type": "MultiStepLR",
    # milestone 1 so the disc lr halves between the two adv steps
    "discriminator_scheduler_params": {"milestones": [1], "gamma": 0.5},
    "discriminator_grad_norm": -1,
    "start_steps": {"generator": 0, "discriminator": 3},
    "train_max_steps": 1000,
    "adv_train_max_steps": 1000,
    "batch_size": 2, "batch_length": 1200,
}

N_METRIC, N_ADV = 3, 2


def sd_np(module):
    return {k: v.detach().cpu().numpy().copy()
            for k, v in module.state_dict().items()}


def main():
    import tempfile

    cfg_dir = tempfile.mkdtemp()
    cfg_path = os.path.join(cfg_dir, "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(CONFIG, f)

    import codecTrain

    args = types.SimpleNamespace(config=cfg_path, tag="train_step_golden",
                                 exp_root=cfg_dir, resume="", seed=1337,
                                 disable_cudnn="False")
    tm = codecTrain.TrainMain(args=args)
    tm.define_model()
    tm.define_criterion()
    tm.define_trainer()
    trainer = tm.trainer

    class _Tqdm:
        def update(self, n=1):
            pass

    trainer.tqdm = _Tqdm()

    rng = np.random.default_rng(42)
    batches = [0.3 * rng.standard_normal(
        (CONFIG["batch_size"], 1, CONFIG["batch_length"])).astype(np.float32)
        for _ in range(N_METRIC + N_ADV)]

    out = {"x_all": np.stack(batches)}
    out.update({"sd0_gen__" + k: v
                for k, v in sd_np(tm.model["generator"]).items()})
    out.update({"sd0_disc__" + k: v
                for k, v in sd_np(tm.model["discriminator"]).items()})

    for i, b in enumerate(batches):
        trainer._train_step(torch.tensor(b))
        if i == N_METRIC - 1:
            out.update({"sdm_gen__" + k: v
                        for k, v in sd_np(tm.model["generator"]).items()})
    out.update({"sda_gen__" + k: v
                for k, v in sd_np(tm.model["generator"]).items()})
    out.update({"sda_disc__" + k: v
                for k, v in sd_np(tm.model["discriminator"]).items()})
    out["n_metric"] = np.array(N_METRIC)
    out["n_adv"] = np.array(N_ADV)

    np.savez_compressed(os.path.join(OUT, "train_step.npz"), **out)
    print(f"train_step golden: {N_METRIC} metric + {N_ADV} adv steps, "
          f"steps={trainer.steps}")


if __name__ == "__main__":
    main()
