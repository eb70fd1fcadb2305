"""Dump a golden parity vector from a *trained* reference checkpoint.

Unlike tools/make_golden.py (seeded-random weights), this runs the actual
torch reference model with weights trained by the reference's own trainer
(tools/ref_train.py drives /root/reference/codecTrain.py), on real held-out
audio.  Pins the end-to-end trained-weights contract: bit-exact RVQ indices
+ decode parity vs the reference on trained codebooks, where codeword
margins are realistic rather than random.

Usage:
  python tools/dump_trained_golden.py --pkl exp_ref/symAD_short/checkpoint-3100steps.pkl \
      --config exp_ref/symAD_short/config.yml --wav data/synth_ref/test/test_0000.wav \
      --out tests/golden/gen_symad_trained.npz [--seconds 1.0]
"""

import argparse
import os
import sys

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pkl", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--wav", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seconds", type=float, default=1.0)
    args = ap.parse_args()

    from models.autoencoder.AudioDec import StreamGenerator

    from audiodec_tpu.data.wav import read_wav

    with open(args.config) as f:
        config = yaml.safe_load(f)
    gp = dict(config["generator_params"])
    model = StreamGenerator(**gp)
    state = torch.load(args.pkl, map_location="cpu", weights_only=True)
    sd = state["model"]["generator"]
    model.load_state_dict(sd)
    model.eval()
    steps = int(state.get("steps", -1))

    wav, sr = read_wav(args.wav)  # (T, C) float32
    assert sr == config["sampling_rate"], (sr, config["sampling_rate"])
    T = int(args.seconds * sr)
    hop = int(np.prod(gp["enc_strides"]))
    T = (min(T, wav.shape[0]) // hop) * hop
    x = wav[:T, :1].T[None].astype(np.float32)  # (1, 1, T)
    xt = torch.tensor(x)

    with torch.no_grad():
        y, zq, z, vqloss, ppl = model(xt)

        # streaming paths (ref: AudioDec.py:228-247)
        model.reset_buffer()
        model.quantizer.initial()
        zs = model.encode(xt)
        idx = model.quantize(zs)
        zq_s = model.lookup(idx)
        ys = model.decode(zq_s)

        # hop-by-hop streaming over 6 hops
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

    sd_np = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(
        args.out,
        x=x, y=y.numpy(), zq=zq.numpy(), z=z.numpy(),
        vqloss=vqloss.numpy(), perplexity=ppl.numpy(),
        z_stream=zs.numpy(), idx_stream=idx.numpy(),
        zq_stream=zq_s.numpy(), y_stream=ys.numpy(),
        y_hops=y_hops, n_hops=np.array(n_hops),
        trained_steps=np.array(steps),
        **{"sd__" + k: v for k, v in sd_np.items()},
    )
    used = sorted(set(np.unique(np.asarray(idx) % gp["codebook_size"])))
    print(f"trained golden: steps={steps} T={T} idx={tuple(idx.shape)} "
          f"distinct_codes={len(used)} -> {args.out}")


if __name__ == "__main__":
    main()
