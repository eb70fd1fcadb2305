"""Generate golden parity vectors by running the reference implementation.

Runs the actual facebookresearch/AudioDec torch code (mounted read-only at
/root/reference) with seeded random weights, and dumps inputs/outputs/
state_dict to tests/golden/*.npz.  Tests load the npz only — they never import
the reference.

Usage: python tools/make_golden.py
"""

import os
import sys

os.environ["PYTHONDONTWRITEBYTECODE"] = "1"
sys.dont_write_bytecode = True
sys.path.insert(0, "/root/reference")

import types

import numpy as np
import torch

# torchaudio is absent in this image; the reference only needs
# torchaudio.functional.spectrogram (UnivNet spectral discriminator,
# ref discriminator.py:577-588).  Provide a faithful substitute — this is
# the documented torchaudio semantics: constant pad, centered reflect-mode
# torch.stft, |.|^power — so disc_univnet.npz is dumped from the
# reference's own forward.


def _ta_spectrogram(waveform, pad, window, n_fft, hop_length, win_length,
                    power, normalized, center=True, pad_mode="reflect",
                    onesided=True):
    if pad > 0:
        waveform = torch.nn.functional.pad(waveform, (pad, pad), "constant")
    shape = waveform.size()
    waveform = waveform.reshape(-1, shape[-1])
    spec_f = torch.stft(
        waveform, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        window=window, center=center, pad_mode=pad_mode,
        normalized=normalized, onesided=onesided, return_complex=True)
    spec_f = spec_f.reshape(shape[:-1] + spec_f.shape[-2:])
    if power is not None:
        spec_f = spec_f.abs().pow(power)
    return spec_f


if "torchaudio" not in sys.modules:
    ta = types.ModuleType("torchaudio")
    ta.functional = types.ModuleType("torchaudio.functional")
    ta.functional.spectrogram = _ta_spectrogram
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.functional"] = ta.functional

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
os.makedirs(OUT, exist_ok=True)

torch.manual_seed(1234)
np.random.seed(1234)

# Selective regeneration: `python tools/make_golden.py name1 name2` dumps
# only those goldens.  Each golden is self-contained (stores the state_dict
# it was produced with), so a selective run is valid even though the global
# torch RNG stream differs from a full run.
ONLY = set(sys.argv[1:])


def selective(fn):
    def wrapped(name, *a, **k):
        if ONLY and name not in ONLY:
            return
        return fn(name, *a, **k)
    return wrapped


@selective
def dump_generator(name, T=1800, **kwargs):
    from models.autoencoder.AudioDec import StreamGenerator

    model = StreamGenerator(**kwargs)
    # randomize EMA buffers too so importer mapping is exercised
    with torch.no_grad():
        for q in model.quantizer.codebook.layers:
            q.cluster_size.uniform_(0.5, 2.0)
            q.embed_avg.normal_()
    model.eval()

    x = np.random.default_rng(7).standard_normal((1, 1, T)).astype(np.float32)
    xt = torch.tensor(x)

    with torch.no_grad():
        y, zq, z, vqloss, ppl = model(xt)

        # streaming paths (ref: AudioDec.py:228-247): reset buffers first
        model.reset_buffer()
        model.quantizer.initial()
        zs = model.encode(xt)
        idx = model.quantize(zs)
        zq_s = model.lookup(idx)
        ys = model.decode(zq_s)

        # hop-by-hop streaming over 6 hops
        hop = int(np.prod(kwargs.get("enc_strides", (3, 4, 5, 5))))
        model.reset_buffer()
        chunks = []
        n_hops = min(6, T // hop)
        for i in range(n_hops):
            xi = xt[:, :, i * hop:(i + 1) * hop]
            zi = model.encode(xi)
            ii = model.quantize(zi)
            zqi = model.lookup(ii)
            yi = model.decode(zqi)
            chunks.append(yi.numpy())
        y_hops = np.concatenate(chunks, axis=-1)

    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(
        os.path.join(OUT, f"{name}.npz"),
        x=x, y=y.numpy(), zq=zq.numpy(), z=z.numpy(),
        vqloss=vqloss.numpy(), perplexity=ppl.numpy(),
        z_stream=zs.numpy(), idx_stream=idx.numpy(),
        zq_stream=zq_s.numpy(), y_stream=ys.numpy(),
        y_hops=y_hops, n_hops=np.array(n_hops),
        **{"sd__" + k: v for k, v in sd.items()},
    )
    n_params = sum(v.size for k, v in sd.items() if "pad_buffer" not in k)
    print(f"{name}: T={T} params={n_params} idx shape={idx.shape}")


@selective
def dump_noncausal_generator(name, T=1800, **kwargs):
    """Noncausal-mode generator: batch forward only (no streaming API)."""
    from models.autoencoder.AudioDec import Generator

    model = Generator(mode="noncausal", **kwargs)
    model.eval()
    x = np.random.default_rng(9).standard_normal((1, 1, T)).astype(np.float32)
    with torch.no_grad():
        y, zq, z, vqloss, ppl = model(torch.tensor(x))
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(
        os.path.join(OUT, f"{name}.npz"),
        x=x, y=y.numpy(), zq=zq.numpy(), z=z.numpy(),
        vqloss=vqloss.numpy(), perplexity=ppl.numpy(),
        **{"sd__" + k: v for k, v in sd.items()})
    print(f"{name}: noncausal T={T}")


@selective
def dump_vocoder(name, T=24, **kwargs):
    from models.vocoder.HiFiGAN import StreamGenerator

    model = StreamGenerator(**kwargs)
    model.eval()
    cin = kwargs.get("in_channels", 80)
    c = np.random.default_rng(11).standard_normal((1, cin, T)).astype(
        np.float32)
    ct = torch.tensor(c)
    with torch.no_grad():
        y = model(ct)
        model.reset_buffer()
        ys = model.decode(ct.transpose(2, 1))
        # hop-by-hop
        model.reset_buffer()
        chunks = []
        for i in range(T):
            chunks.append(model.decode(
                ct[:, :, i:i + 1].transpose(2, 1)).numpy())
        y_hops = np.concatenate(chunks, axis=-1)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(
        os.path.join(OUT, f"{name}.npz"),
        c=c, y=y.numpy(), y_stream=ys.numpy(), y_hops=y_hops,
        **{"sd__" + k: v for k, v in sd.items()},
    )
    print(f"{name}: T={T} y={tuple(y.shape)}")


@selective
def dump_hifigan_discriminator(name, T=960):
    from models.vocoder.HiFiGAN import Discriminator

    torch.manual_seed(77)
    model = Discriminator(
        scale_discriminator_params={
            "in_channels": 1, "out_channels": 1, "kernel_sizes": [15, 41, 5, 3],
            "channels": 16, "max_downsample_channels": 64, "max_groups": 16,
            "bias": True, "downsample_scales": [2, 2, 4, 4, 1],
            "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.1},
        },
        follow_official_norm=False,
        period_discriminator_params={
            "in_channels": 1, "out_channels": 1, "kernel_sizes": [5, 3],
            "channels": 8, "downsample_scales": [3, 3, 3, 3, 1],
            "max_downsample_channels": 64, "bias": True,
            "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.1},
            "use_weight_norm": True, "use_spectral_norm": False,
        },
    )
    model.eval()
    x = np.random.default_rng(13).standard_normal((2, 1, T)).astype(
        np.float32)
    with torch.no_grad():
        outs = model(torch.tensor(x))
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    flat = {}
    for i, branch in enumerate(outs):
        for j, t in enumerate(branch):
            flat[f"out_{i}_{j}"] = t.numpy()
    np.savez_compressed(
        os.path.join(OUT, f"{name}.npz"), x=x,
        n_branches=np.array(len(outs)),
        **{f"n_layers_{i}": np.array(len(b)) for i, b in enumerate(outs)},
        **flat, **{"sd__" + k: v for k, v in sd.items()})
    print(f"{name}: {len(outs)} branches")


@selective
def dump_generator_bn(name, T=1800, **kwargs):
    """conv1d_bn projector variant (ref: projector.py:39-47).  The
    reference's streaming path for this variant is broken (nn.Sequential
    has no .inference), so batch forward only: once in eval mode
    (running-stat BN) and once in train mode (batch-stat BN + running-stat
    update + codebook EMA), with pre/post state_dicts."""
    from models.autoencoder.AudioDec import Generator

    model = Generator(projector="conv1d_bn", **kwargs)
    with torch.no_grad():
        bn = model.projector.project[1]
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.normal_(std=0.2)
        bn.running_mean.normal_(std=0.5)
        bn.running_var.uniform_(0.5, 2.0)
        for q in model.quantizer.codebook.layers:
            q.cluster_size.uniform_(0.5, 2.0)
            q.embed_avg.normal_()

    x = np.random.default_rng(21).standard_normal((2, 1, T)).astype(
        np.float32)
    xt = torch.tensor(x)
    sd0 = {k: v.detach().cpu().numpy().copy()
           for k, v in model.state_dict().items()}
    model.eval()
    with torch.no_grad():
        y, zq, z, vqloss, ppl = model(xt)
    ev = dict(y=y.numpy(), zq=zq.numpy(), z=z.numpy(),
              vqloss=vqloss.numpy(), perplexity=ppl.numpy())
    model.train()
    yt, zqt, zt, vqlosst, pplt = model(xt)
    tr = dict(y_train=yt.detach().numpy(), zq_train=zqt.detach().numpy(),
              z_train=zt.detach().numpy(),
              vqloss_train=vqlosst.detach().numpy(),
              perplexity_train=pplt.detach().numpy())
    sd1 = {k: v.detach().cpu().numpy().copy()
           for k, v in model.state_dict().items()}
    np.savez_compressed(
        os.path.join(OUT, f"{name}.npz"), x=x, **ev, **tr,
        **{"sd__" + k: v for k, v in sd0.items()},
        **{"sd1__" + k: v for k, v in sd1.items()})
    print(f"{name}: T={T} bn projector")


@selective
def dump_univnet_discriminator(name, T=2400):
    """UnivNet MRSD golden from the reference's own forward (ref:
    discriminator.py:451-640), using the faithful torchaudio spectrogram
    substitute above.  Default resolutions: fft 1024/2048/512,
    hop 120/240/50, win 600/1200/240."""
    from models.vocoder.modules.discriminator import (
        UnivNetMultiResolutionSpectralDiscriminator)

    torch.manual_seed(99)
    model = UnivNetMultiResolutionSpectralDiscriminator(
        discriminator_params={
            "channels": 16,
            "kernel_sizes": [(3, 9), (3, 9), (3, 9), (3, 9), (3, 3), (3, 3)],
            "strides": [(1, 1), (1, 2), (1, 2), (1, 2), (1, 1), (1, 1)],
            "bias": True,
            "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.2},
        })
    model.eval()
    x = np.random.default_rng(17).standard_normal((2, 1, T)).astype(
        np.float32)
    with torch.no_grad():
        outs = model(torch.tensor(x))
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    flat = {}
    for i, branch in enumerate(outs):
        for j, t in enumerate(branch):
            flat[f"out_{i}_{j}"] = t.numpy()
    np.savez_compressed(
        os.path.join(OUT, f"{name}.npz"), x=x,
        n_branches=np.array(len(outs)),
        **{f"n_layers_{i}": np.array(len(b)) for i, b in enumerate(outs)},
        **flat, **{"sd__" + k: v for k, v in sd.items()})
    print(f"{name}: {len(outs)} branches")


def main():
    # small fast config for CI-style tests
    dump_generator(
        "gen_small", T=1800,
        input_channels=1, output_channels=1, encode_channels=4,
        decode_channels=4, code_dim=16, codebook_num=4, codebook_size=32,
        enc_ratios=(2, 4, 8, 16), dec_ratios=(16, 8, 4, 2),
        enc_strides=(3, 4, 5, 5), dec_strides=(5, 5, 4, 3),
        mode="causal", codec="audiodec",
    )
    # full-size symAD_vctk_48000_hop300 architecture
    # (config/autoencoder/symAD_vctk_48000_hop300.yaml:28-44)
    dump_generator(
        "gen_symad", T=3600,
        input_channels=1, output_channels=1, encode_channels=32,
        decode_channels=32, code_dim=64, codebook_num=8, codebook_size=1024,
        enc_ratios=(2, 4, 8, 16), dec_ratios=(16, 8, 4, 2),
        enc_strides=(3, 4, 5, 5), dec_strides=(5, 5, 4, 3),
        mode="causal", codec="audiodec",
    )
    # activate_audiodec (symAAD) variant with weight norm
    dump_generator(
        "gen_symaad", T=1800,
        input_channels=1, output_channels=1, encode_channels=4,
        decode_channels=4, code_dim=16, codebook_num=4, codebook_size=32,
        enc_ratios=(2, 4, 8, 16), dec_ratios=(16, 8, 4, 2),
        enc_strides=(3, 4, 5, 5), dec_strides=(5, 5, 4, 3),
        mode="causal", codec="activate_audiodec", use_weight_norm=True,
    )

    # vocoder v0-style: MultiReceptiveField, small channels
    dump_vocoder(
        "voc_mrf", T=24,
        in_channels=16, out_channels=1, channels=32, kernel_size=7,
        upsample_scales=(5, 5, 4, 3), upsample_kernel_sizes=(10, 10, 8, 6),
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilations=[(1, 3, 5), (1, 3, 5), (1, 3, 5)],
        groups=1, use_weight_norm=True,
    )
    # vocoder v1-style: MultiGroupConv1d + input stats normalization
    stats = np.stack([
        np.random.default_rng(3).standard_normal(16).astype(np.float32),
        (0.5 + np.random.default_rng(4).random(16)).astype(np.float32),
    ])
    stats_path = os.path.join(OUT, "_tmp_stats.npy")
    np.save(stats_path, stats)
    dump_vocoder(
        "voc_group", T=24,
        in_channels=16, out_channels=1, channels=32, kernel_size=7,
        upsample_scales=(5, 5, 4, 3), upsample_kernel_sizes=(10, 10, 8, 6),
        resblock_kernel_sizes=[11], resblock_dilations=[[1, 3, 5]],
        groups=3, use_weight_norm=True, stats=stats_path,
    )
    os.remove(stats_path)

    dump_hifigan_discriminator("disc_hifigan")

    dump_noncausal_generator(
        "gen_noncausal", T=1800,
        input_channels=1, output_channels=1, encode_channels=4,
        decode_channels=4, code_dim=16, codebook_num=4, codebook_size=32,
        enc_ratios=(2, 4, 8, 16), dec_ratios=(16, 8, 4, 2),
        enc_strides=(3, 4, 5, 5), dec_strides=(5, 5, 4, 3),
        codec="audiodec",
    )

    dump_generator_bn(
        "gen_symad_bn", T=1800,
        input_channels=1, output_channels=1, encode_channels=4,
        decode_channels=4, code_dim=16, codebook_num=4, codebook_size=32,
        enc_ratios=(2, 4, 8, 16), dec_ratios=(16, 8, 4, 2),
        enc_strides=(3, 4, 5, 5), dec_strides=(5, 5, 4, 3),
        mode="causal", codec="audiodec",
    )

    dump_univnet_discriminator("disc_univnet")


if __name__ == "__main__":
    main()
