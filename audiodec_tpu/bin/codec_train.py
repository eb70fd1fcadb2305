"""Training entry point for all modes (capability twin of ref codecTrain.py +
bin/train.py): autoencoder / vocoder / denoise, selected by the config's
`train_mode`.

Seeds, expdir snapshot, resume/initial warm-starts, frozen-analyzer loading
for vocoder mode, and the metric->adversarial stage switch (with the
dataloader swap to adv_batch_length, ref bin/train.py:112-118) all mirror the
reference.

Usage:
  python -m audiodec_tpu.bin.codec_train --config configs/autoencoder/... \
      --tag exp/autoencoder/mytag [--resume ckpt] [--dp N]
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
import yaml

import jax

from audiodec_tpu.data import (
    CollaterAudio,
    CollaterAudioPair,
    MultiDataset,
    SingleDataset,
)
from audiodec_tpu.data.loader import DataLoader
from audiodec_tpu.models.autoencoder import generator_init
from audiodec_tpu.models.discriminators import (
    hifigan_discriminator_apply,
    hifigan_discriminator_init,
    univnet_discriminator_apply,
    univnet_discriminator_init,
)
from audiodec_tpu.models.vocoder import vocoder_init
from audiodec_tpu.train.checkpoint import load_only_params
from audiodec_tpu.train.criterion import build_criterion
from audiodec_tpu.train.optim import make_optimizer
from audiodec_tpu.train.steps import (
    make_autoencoder_steps,
    make_denoise_steps,
    make_vocoder_steps,
)
from audiodec_tpu.train.trainer import GanTrainer
from audiodec_tpu.utils.config import (
    discriminator_config,
    generator_config,
    load_config,
    load_config_near_checkpoint,
    univnet_discriminator_config,
)


def _subset_path(config, subset):
    return os.path.join(config["data"]["path"],
                        config["data"]["subset"][subset])


def build_dataloaders(config, train_mode, batch_length):
    bs = config.get("batch_size", 16)
    workers = config.get("num_workers", 2)
    if train_mode in ("autoencoder", "vocoder"):
        train = SingleDataset(_subset_path(config, "train"))
        valid = SingleDataset(_subset_path(config, "valid"))
        col = CollaterAudio(batch_length)
        mk = lambda ds, sh: DataLoader(ds, col, bs, shuffle=sh,  # noqa: E731
                                       num_workers=workers)
        return mk(train, True), mk(valid, False)
    if train_mode == "denoise":
        # (noisy, clean) pair corpora (ref: codecTrain.py:55-65,
        # config/denoise subset keys)
        train = MultiDataset([_subset_path(config, "noisy_train"),
                              _subset_path(config, "clean_train")])
        valid = MultiDataset([_subset_path(config, "noisy_valid"),
                              _subset_path(config, "clean_valid")])
        col = CollaterAudioPair(batch_length)
        mk = lambda ds, sh: DataLoader(ds, col, bs, shuffle=sh,  # noqa: E731
                                       num_workers=workers)
        return mk(train, True), mk(valid, False)
    raise NotImplementedError(f"train_mode {train_mode}")


def load_analyzer(config):
    """Frozen analyzer generator for vocoder mode
    (ref: codecTrain.py:258-267)."""
    ckpt = config["analyzer"]
    an_config = load_config_near_checkpoint(ckpt)
    gen_cfg = generator_config(an_config)
    template = generator_init(jax.random.PRNGKey(0), gen_cfg)
    params, _ = load_only_params(ckpt, "gen", template=template)
    return params, gen_cfg


def main(argv=None):
    from audiodec_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--tag", required=True, help="experiment output dir")
    parser.add_argument("--exp-root", default="",
                        help="prefix joined ahead of --tag "
                             "(ref codecTrain.py --exp_root; expdir = "
                             "exp_root/tag)")
    parser.add_argument("--resume", default="")
    parser.add_argument("--seed", type=int, default=1337)
    parser.add_argument("--dp", type=int, default=1,
                        help="data-parallel replicas (devices)")
    parser.add_argument("--coordinator", default=None,
                        help="multi-host training: coordinator host:port "
                             "(every host runs this CLI with the same "
                             "config/tag/seed; batch_size is the GLOBAL "
                             "batch, sharded over all hosts' devices)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    if args.coordinator is not None:
        from audiodec_tpu.parallel import init_distributed
        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)
    multihost = jax.process_count() > 1
    primary = jax.process_index() == 0

    config = load_config(args.config)
    if args.exp_root:
        args.tag = os.path.join(args.exp_root, args.tag)
    os.makedirs(args.tag, exist_ok=True)
    # snapshot config next to checkpoints (ref: bin/train.py:58-64)
    if primary:
        with open(os.path.join(args.tag, "config.yml"), "w") as f:
            yaml.safe_dump(config, f)

    train_mode = config.get("train_mode", "autoencoder")
    model_type = config.get("model_type", "symAudioDec")
    key = jax.random.PRNGKey(args.seed)
    k_gen, k_disc = jax.random.split(key)
    crit = build_criterion(config)
    gen_opt = make_optimizer(config, "generator")
    disc_opt = make_optimizer(config, "discriminator")
    axis_name = "data" if (args.dp > 1 or multihost) else None

    univ = model_type in ("symAudioDecUniv", "UnivNet")
    use_wn = config.get("generator_params", {}).get("use_weight_norm", False)

    if train_mode in ("autoencoder", "denoise"):
        gen_cfg = generator_config(config)
        gen = generator_init(k_gen, gen_cfg)
        if use_wn:
            # weight-norm reparametrized training (ref: AudioDec.py:107-109);
            # decoder block convs are transposed (input-channel axis norm)
            from audiodec_tpu.ops.norms import apply_weight_norm_tree
            tp = tuple(f"decoder/blocks/{i}/conv"
                       for i in range(len(gen_cfg.dec_strides)))
            gen = apply_weight_norm_tree(gen, transposed_paths=tp)
    else:
        gen_cfg = generator_config(config)  # vocoder config
        gen = vocoder_init(k_gen, gen_cfg)
        if config.get("generator_params", {}).get("use_weight_norm", True):
            from audiodec_tpu.ops.norms import apply_weight_norm_tree
            tp = tuple(f"upsamples/{i}"
                       for i in range(len(gen_cfg.upsample_scales)))
            gen = apply_weight_norm_tree(gen, transposed_paths=tp)
        if gen_cfg.stats and config["generator_params"].get("stats"):
            stats = np.load(config["generator_params"]["stats"])
            import jax.numpy as jnp
            gen["mean"] = jnp.asarray(stats[0].reshape(-1))
            gen["scale"] = jnp.asarray(stats[1].reshape(-1))

    if train_mode == "denoise":
        state = {"gen": gen, "gen_opt": gen_opt.init(gen)}
        steps = make_denoise_steps(gen_cfg, config, crit, gen_opt,
                                   axis_name=axis_name,
                                   jit=(axis_name is None))
    else:
        disc_cfg = discriminator_config(config)
        if univ:
            disc = univnet_discriminator_init(k_disc, disc_cfg)
            disc_apply = lambda p, x: univnet_discriminator_apply(  # noqa
                p, x, disc_cfg)
        else:
            disc = hifigan_discriminator_init(k_disc, disc_cfg)
            disc_apply = lambda p, x: hifigan_discriminator_apply(  # noqa
                p, x, disc_cfg)
        state = {"gen": gen, "disc": disc, "gen_opt": gen_opt.init(gen),
                 "disc_opt": disc_opt.init(disc)}
        if train_mode == "autoencoder":
            steps = make_autoencoder_steps(gen_cfg, disc_apply, config, crit,
                                           gen_opt, disc_opt,
                                           axis_name=axis_name,
                                           jit=(axis_name is None))
        else:
            analyzer, an_cfg = load_analyzer(config)
            state["analyzer"] = analyzer
            steps = make_vocoder_steps(gen_cfg, an_cfg, disc_apply, config,
                                       crit, gen_opt, disc_opt,
                                       axis_name=axis_name,
                                       jit=(axis_name is None))

    mesh = None
    if axis_name is not None:
        from audiodec_tpu.train.steps import shard_steps
        if multihost:
            # global mesh over every process's devices; grads + EMA stats
            # psum across hosts, so N-host training == 1-host training at
            # the same global batch
            from audiodec_tpu.parallel import global_mesh
            mesh = global_mesh(data=-1 if args.dp <= 1 else args.dp, seq=1)
            assert mesh.shape["data"] % jax.process_count() == 0
        else:
            from audiodec_tpu.parallel import make_mesh
            mesh = make_mesh(data=args.dp, seq=1)
        steps = shard_steps(steps, mesh, axis_name)

    # warm start (ref `initial:` key, codecTrain.py:245-247)
    if config.get("initial"):
        from flax import serialization
        params, _ = load_only_params(config["initial"], "gen")
        state["gen"] = serialization.from_state_dict(state["gen"], params)
        logging.info("Warm-started generator from %s", config["initial"])

    bl = config.get("batch_length", 9600)
    adv_bl = config.get("adv_batch_length", bl)
    train_dl, valid_dl = build_dataloaders(config, train_mode, bl)
    adv_dl = train_dl if adv_bl == bl else \
        build_dataloaders(config, train_mode, adv_bl)[0]

    if multihost:
        # every host builds the identical global batch (same file lists +
        # seeds), carves its contiguous rows, and assembles a global sharded
        # array (same discipline as the codec_test CLI)
        from jax.sharding import PartitionSpec as P
        from audiodec_tpu.parallel import host_local_to_global

        nproc, pid = jax.process_count(), jax.process_index()

        def to_global(a):
            assert a.shape[0] % nproc == 0, \
                f"global batch {a.shape[0]} must divide over {nproc} hosts"
            rows = a.shape[0] // nproc
            spec = P("data", *([None] * (a.ndim - 1)))
            return host_local_to_global(mesh, spec,
                                        a[pid * rows:(pid + 1) * rows])

        def global_iter(it):
            for batch in it:
                if isinstance(batch, tuple):
                    yield tuple(to_global(b) for b in batch)
                else:
                    yield to_global(batch)

        train_it = global_iter(train_dl.infinite())
        adv_it = global_iter(adv_dl.infinite())
        eval_it_fn = lambda: global_iter(iter(valid_dl))  # noqa: E731
    else:
        train_it = train_dl.infinite()
        adv_it = adv_dl.infinite()
        eval_it_fn = lambda: iter(valid_dl)  # noqa: E731

    trainer = GanTrainer(
        steps_fns=steps, state=state, config=config, outdir=args.tag,
        train_iter=train_it,
        adv_train_iter=adv_it,
        eval_iter_fn=eval_it_fn,
        strict_start=(train_mode == "autoencoder"),
        primary=primary,
        steps_per_epoch=len(train_dl) or None,
        adv_steps_per_epoch=len(adv_dl) or None,
    )
    if args.resume:
        trainer.resume(args.resume)
    trainer.run()


if __name__ == "__main__":
    main()
