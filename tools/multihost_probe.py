"""Multi-host (N>=2 process) verification probe.

Launches itself as N JAX processes over the Gloo/distributed runtime (CPU
backend, K virtual devices per process) and runs the two cross-host
workloads on a global ('data','seq') mesh spanning every process:

  1. chunk-halo sharded transcode (parallel.make_sharded_codec): utterance
     batch sharded over 'data' across hosts, time axis over 'seq'; the halo
     `ppermute`s cross the host boundary.  Verified against an unsharded
     single-device transcode of the same batch: RVQ indices bit-exact,
     waveform to f32 rounding.
  2. data-parallel GAN training steps (train.steps with psum'd grads + EMA
     codebook stats) over all hosts' devices; verified by checking the
     updated parameters are identical on every process.

This is the CPU stand-in for a v5e multi-host pod slice (the BASELINE.json
"N>=2 hosts" measurement): same program, same collectives; only the
interconnect differs.  On a real pod run the same worker with
--coordinator/--num-processes/--process-id from the pod launcher (or bare
`init_distributed()` to use the TPU metadata).

Usage:  python tools/multihost_probe.py [--nprocs 2] [--devices-per-proc 2]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

PORT = int(os.environ.get("AUDIODEC_MH_PORT", "23457"))


def worker_fullsize(pid: int, nprocs: int, devices_per_proc: int) -> None:
    """Full-size canonical-config DP training across process boundaries:
    one metric + one adversarial step of the shipping symAD architecture
    (8.99M gen) + the full HiFiGAN MSD+MPD discriminator from
    configs/autoencoder/symAD_vctk_48000_hop300.yaml, grads/EMA psum'd
    over a mesh spanning every process (SURVEY §2.1.3; EMA-under-DP per
    ref layers/vq_module.py:74-80).  Asserts finite losses and identical
    post-update params on every host."""
    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    # persistent compile cache: the full-size graph compiles for minutes on
    # a contended CPU, and Gloo's context init has a 30 s deadline at the
    # first collective — if the two processes' compiles finish far apart
    # the slower one misses the rendezvous.  With the cache, a retry after
    # a failed first attempt dispatches from cache near-simultaneously.
    from audiodec_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from audiodec_tpu.parallel import host_local_to_global, init_distributed
    init_distributed(f"localhost:{PORT}", nprocs, pid)
    assert jax.process_count() == nprocs

    import numpy as np
    from jax import shard_map
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as P

    from audiodec_tpu.models.autoencoder import generator_init
    from audiodec_tpu.models.discriminators import (
        hifigan_discriminator_apply, hifigan_discriminator_init,
    )
    from audiodec_tpu.train.criterion import build_criterion
    from audiodec_tpu.train.optim import make_optimizer
    from audiodec_tpu.train.steps import make_autoencoder_steps
    from audiodec_tpu.utils.config import (
        discriminator_config, generator_config, load_config,
    )

    cfg_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "autoencoder",
        "symAD_vctk_48000_hop300.yaml")
    config = load_config(cfg_path)
    gen_cfg = generator_config(config)
    disc_cfg = discriminator_config(config)

    def disc_apply(p, xx):
        return hifigan_discriminator_apply(p, xx, disc_cfg)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gen = generator_init(k1, gen_cfg)          # same on all procs
    disc = hifigan_discriminator_init(k2, disc_cfg)
    gen_opt = make_optimizer(config, "generator")
    disc_opt = make_optimizer(config, "discriminator")
    state = {"gen": gen, "disc": disc, "gen_opt": gen_opt.init(gen),
             "disc_opt": disc_opt.init(disc)}
    steps = make_autoencoder_steps(gen_cfg, disc_apply, config,
                                   build_criterion(config), gen_opt,
                                   disc_opt, axis_name="data", jit=False)

    n_dev = nprocs * devices_per_proc
    dp_mesh = Mesh(np.array(jax.devices()), ("data",))
    bl = int(config["batch_length"])
    xt_full = (0.1 * np.random.RandomState(7)
               .randn(n_dev, bl, 1)).astype(np.float32)
    xt_local = xt_full[pid * devices_per_proc:(pid + 1) * devices_per_proc]
    xt = host_local_to_global(dp_mesh, P("data", None, None), xt_local)

    def dp_step(kind):
        return jax.jit(shard_map(
            lambda s, xx: steps[kind](s, xx), mesh=dp_mesh,
            in_specs=(P(), P("data")), out_specs=(P(), P()),
            check_vma=False))

    state, m1 = dp_step("metric")(state, xt)
    state, m2 = dp_step("adv")(state, xt)
    jax.block_until_ready(m2)
    for m in (m1, m2):
        for k, v in m.items():
            assert np.isfinite(np.asarray(v)).all(), f"non-finite {k}"

    from jax.experimental import multihost_utils
    leaf = np.asarray(
        jax.tree_util.tree_leaves(state["gen"])[0].addressable_data(0))
    gathered = np.asarray(multihost_utils.process_allgather(leaf))
    assert (gathered == gathered[0]).all(), "host param divergence"
    print(f"multihost_probe[fullsize] proc {pid}/{nprocs}: OK — canonical "
          f"symAD + full MSD/MPD metric+adv DP steps across {nprocs} "
          f"hosts, losses finite, params synchronized", flush=True)


def worker(pid: int, nprocs: int, devices_per_proc: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from audiodec_tpu.parallel import (
        global_mesh, global_to_host_local, host_local_to_global,
        init_distributed, make_sharded_codec,
    )
    init_distributed(f"localhost:{PORT}", nprocs, pid)
    assert jax.process_count() == nprocs

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from audiodec_tpu.models.autoencoder import (
        GeneratorConfig, decoder_apply, encoder_apply, generator_init,
        projector_apply,
    )
    from audiodec_tpu.ops.vq import rvq_forward_index, rvq_lookup

    cfg = GeneratorConfig(encode_channels=2, decode_channels=2, code_dim=8,
                          codebook_num=2, codebook_size=16)
    params = generator_init(jax.random.PRNGKey(0), cfg)  # same on all procs
    hop = cfg.hop_length

    n_dev = nprocs * devices_per_proc
    seq = devices_per_proc  # seq groups span hosts at the data-row seams
    data = n_dev // seq
    mesh = global_mesh(data=data, seq=seq)

    # --- 1. cross-host chunk-halo transcode, bit-exact vs unsharded ---
    B, T = data, seq * 8 * hop
    rng = np.random.RandomState(7)
    x_full = rng.randn(B, T, 1).astype(np.float32)  # same on all procs
    rows_per_proc = B // nprocs if B >= nprocs else B
    lo = pid * rows_per_proc if B >= nprocs else 0
    x_local = x_full[lo:lo + rows_per_proc] if B >= nprocs else x_full
    xg = host_local_to_global(mesh, P("data", "seq", None), x_local)

    encode, decode = make_sharded_codec(mesh, params, cfg)
    idx_g = encode(xg)
    y_g = decode(idx_g)
    idx = global_to_host_local(idx_g)
    y = global_to_host_local(y_g)

    @jax.jit
    def ref_transcode(x):
        h = encoder_apply(params["encoder"], x, cfg)
        z = projector_apply(params["projector"], h, cfg)
        _, i = rvq_forward_index(z, params["quantizer"])
        zq = rvq_lookup(i, params["quantizer"])
        return i, decoder_apply(params["decoder"], zq, cfg)

    with jax.default_device(jax.local_devices()[0]):
        idx_ref, y_ref = ref_transcode(jnp.asarray(x_full))
    assert (idx == np.asarray(idx_ref)).all(), "RVQ indices diverge"
    # waveform: identical math at seams; float noise only (XLA reassociates
    # conv reductions across different padded shapes), same as test_parallel
    np.testing.assert_allclose(y, np.asarray(y_ref), rtol=1e-5, atol=1e-6)

    # --- 1b. seq axis SPANNING process boundaries with halo >> shard ---
    # mesh (1, n_dev): every seq seam between hosts is a DCN-like boundary,
    # and 2 hops per shard (600 samples) << the 7209-sample encoder halo,
    # so _left_halo's multi-hop ppermute chain crosses processes
    # (parallel/codec.py:92-99).
    mesh_x = global_mesh(data=1, seq=n_dev)
    T2 = n_dev * 2 * hop
    x2_full = rng.randn(1, T2, 1).astype(np.float32)
    seg = T2 // nprocs  # this host's time segment (seq is process-major)
    x2_local = x2_full[:, pid * seg:(pid + 1) * seg]
    x2g = host_local_to_global(mesh_x, P("data", "seq", None), x2_local)
    enc_x, dec_x = make_sharded_codec(mesh_x, params, cfg)
    idx2_g = enc_x(x2g)
    idx2 = global_to_host_local(idx2_g)
    y2 = global_to_host_local(dec_x(idx2_g))
    with jax.default_device(jax.local_devices()[0]):
        idx2_ref, y2_ref = ref_transcode(jnp.asarray(x2_full))
    assert (idx2 == np.asarray(idx2_ref)).all(), \
        "cross-host multi-hop halo: RVQ indices diverge"
    np.testing.assert_allclose(y2, np.asarray(y2_ref), rtol=1e-5, atol=1e-6)

    # --- 2. cross-host data-parallel training steps ---
    from jax import shard_map
    from jax.sharding import Mesh
    from audiodec_tpu.models.discriminators import (
        HiFiGANDiscriminatorConfig, MultiPeriodConfig, MultiScaleConfig,
        PeriodDiscriminatorConfig, ScaleDiscriminatorConfig,
        hifigan_discriminator_apply, hifigan_discriminator_init,
    )
    from audiodec_tpu.train.criterion import build_criterion
    from audiodec_tpu.train.optim import make_optimizer
    from audiodec_tpu.train.steps import make_autoencoder_steps

    disc_cfg = HiFiGANDiscriminatorConfig(
        msd=MultiScaleConfig(scales=2, follow_official_norm=True,
                             discriminator=ScaleDiscriminatorConfig(
                                 channels=16, max_downsample_channels=32,
                                 max_groups=4)),
        mpd=MultiPeriodConfig(periods=(2, 3),
                              discriminator=PeriodDiscriminatorConfig(
                                  channels=4, max_downsample_channels=16)))
    config = {
        "sampling_rate": 48000,
        "use_mel_loss": True,
        "mel_loss_params": {"fs": 48000, "fft_sizes": [256],
                            "hop_sizes": [64], "win_lengths": [256],
                            "num_mels": 8, "fmin": 0, "fmax": 24000,
                            "log_base": None},
        "use_feat_match_loss": True,
        "lambda_adv": 1.0, "lambda_feat_match": 2.0, "lambda_vq_loss": 1.0,
        "lambda_mel_loss": 45.0,
        "generator_optimizer_params": {"lr": 1e-4, "betas": [0.5, 0.9]},
        "discriminator_optimizer_params": {"lr": 2e-4, "betas": [0.5, 0.9]},
        "generator_scheduler_params": {"step_size": 200000, "gamma": 1.0},
        "discriminator_scheduler_params": {"gamma": 0.5,
                                           "milestones": [200000]},
        "generator_grad_norm": -1, "discriminator_grad_norm": -1,
    }

    def disc_apply(p, xx):
        return hifigan_discriminator_apply(p, xx, disc_cfg)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gen = generator_init(k1, cfg)
    disc = hifigan_discriminator_init(k2, disc_cfg)
    gen_opt = make_optimizer(config, "generator")
    disc_opt = make_optimizer(config, "discriminator")
    state = {"gen": gen, "disc": disc, "gen_opt": gen_opt.init(gen),
             "disc_opt": disc_opt.init(disc)}
    steps = make_autoencoder_steps(cfg, disc_apply, config,
                                   build_criterion(config), gen_opt,
                                   disc_opt, axis_name="data", jit=False)

    dp_mesh = Mesh(np.array(jax.devices()), ("data",))
    xt_full = rng.randn(n_dev, 2 * hop, 1).astype(np.float32)
    xt_local = xt_full[pid * devices_per_proc:(pid + 1) * devices_per_proc]
    xt = host_local_to_global(dp_mesh, P("data", None, None), xt_local)

    def dp_step(kind):
        return jax.jit(shard_map(
            lambda s, xx: steps[kind](s, xx), mesh=dp_mesh,
            in_specs=(P(), P("data")), out_specs=(P(), P()),
            check_vma=False))

    state, m1 = dp_step("metric")(state, xt)
    state, m2 = dp_step("adv")(state, xt)
    jax.block_until_ready(m2)
    for m in (m1, m2):
        for k, v in m.items():
            assert np.isfinite(np.asarray(v)).all(), f"non-finite {k}"

    # replicated params must be identical on every host after psum'd updates
    from jax.experimental import multihost_utils
    leaf = np.asarray(
        jax.tree_util.tree_leaves(state["gen"])[0].addressable_data(0))
    gathered = np.asarray(multihost_utils.process_allgather(leaf))
    assert (gathered == gathered[0]).all(), "host param divergence"

    print(f"multihost_probe proc {pid}/{nprocs}: OK — {data}x{seq} "
          f"cross-host transcode (idx bit-exact, wav to f32 rounding), "
          f"dp train steps finite, params synchronized", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--fullsize", action="store_true",
                    help="run the canonical full-size symAD + MSD/MPD "
                         "DP training step across processes instead of "
                         "the toy-width transcode/training suite")
    args = ap.parse_args(argv)

    if args.process_id is not None:
        if args.fullsize:
            worker_fullsize(args.process_id, args.nprocs,
                            args.devices_per_proc)
        else:
            worker(args.process_id, args.nprocs, args.devices_per_proc)
        return 0

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count="
                        f"{args.devices_per_proc}").strip()
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--nprocs", str(args.nprocs),
         "--devices-per-proc", str(args.devices_per_proc),
         "--process-id", str(i)]
        + (["--fullsize"] if args.fullsize else []), env=env)
        for i in range(args.nprocs)]
    rcs = [p.wait(timeout=3600 if args.fullsize else 600) for p in procs]
    ok = all(r == 0 for r in rcs)
    print(f"multihost_probe: {'OK' if ok else f'FAILED {rcs}'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
