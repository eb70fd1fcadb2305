"""Decode wavs through the TORCH reference model (CPU) for A/B evaluation.

Runs /root/reference's own StreamGenerator (batch forward: encoder ->
quantizer forward -> decoder, ref codecTest.py:78-95) over a directory of
wavs with a trained checkpoint, writing <utt>_output.wav — the reference
half of a tools/eval_quality.py comparison against our TPU decode of the
same files (codec_test --outdir).

Usage:
  python tools/ref_decode.py --pkl exp_ref/symAD_long/checkpoint-20000steps.pkl \
      --config exp_ref/symAD_long/config.yml --indir data/synth_ref/test \
      --outdir /tmp/ref_out_20k
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
    ap.add_argument("--indir", required=True)
    ap.add_argument("--outdir", required=True)
    args = ap.parse_args()

    from models.autoencoder.AudioDec import StreamGenerator

    from audiodec_tpu.data.wav import read_wav, write_wav

    with open(args.config) as f:
        config = yaml.safe_load(f)
    model = StreamGenerator(**dict(config["generator_params"]))
    state = torch.load(args.pkl, map_location="cpu", weights_only=True)
    model.load_state_dict(state["model"]["generator"])
    model.eval()

    os.makedirs(args.outdir, exist_ok=True)
    hop = int(np.prod(config["generator_params"]["enc_strides"]))
    for name in sorted(os.listdir(args.indir)):
        if not name.endswith(".wav"):
            continue
        wav, sr = read_wav(os.path.join(args.indir, name))
        x = torch.from_numpy(wav.T[None]).float()  # (1, C, T)
        t = x.shape[-1] - x.shape[-1] % hop
        x = x[..., :t]
        with torch.no_grad():
            y = model(x)[0]  # ref AudioDec.py forward -> (y, zq, z, ...)
        out = os.path.join(
            args.outdir, name.replace(".wav", "_output.wav"))
        write_wav(out, np.asarray(y[0].T, np.float32), sr)
        print(f"{name} -> {out} ({t} samples)", flush=True)


if __name__ == "__main__":
    main()
