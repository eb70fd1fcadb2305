"""Extract code statistics with the reference analyzer (torch), mirroring
/root/reference/codecStatistic.py:92-112 without sklearn: StandardScaler's
mean_/scale_ are the running mean and population (ddof=0) std over all zq
frames, accumulated here with exact running sums.

Usage:
  python tools/ref_stats.py --pkl exp_ref/symAD_short/checkpoint-3000steps.pkl \
      --config exp_ref/symAD_short/config.yml --data data/synth_ref/train \
      --out exp_ref/stats_symAD_short.npy
"""

import argparse
import glob
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
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from models.autoencoder.AudioDec import Generator

    from audiodec_tpu.data.wav import read_wav

    with open(args.config) as f:
        config = yaml.safe_load(f)
    model = Generator(**config["generator_params"])
    model.load_state_dict(
        torch.load(args.pkl, map_location="cpu",
                   weights_only=True)["model"]["generator"])
    model.eval()

    n, s1, s2 = 0, None, None
    files = sorted(glob.glob(os.path.join(args.data, "**", "*.wav"),
                             recursive=True))
    assert files, args.data
    with torch.no_grad():
        for f in files:
            wav, _ = read_wav(f)  # (T, C)
            x = torch.tensor(wav.T[None], dtype=torch.float)  # (1, C, T)
            h = model.encoder(x)
            z = model.projector(h)
            zq, _, _ = model.quantizer(z)
            zq = zq.squeeze(0).transpose(1, 0).double().numpy()  # (T', D)
            if s1 is None:
                s1 = np.zeros(zq.shape[1])
                s2 = np.zeros(zq.shape[1])
            n += zq.shape[0]
            s1 += zq.sum(0)
            s2 += (zq * zq).sum(0)
    mean = s1 / n
    scale = np.sqrt(np.maximum(s2 / n - mean * mean, 0.0))
    stats = np.stack([mean, scale], axis=0).astype(np.float32)
    np.save(args.out, stats, allow_pickle=False)
    print(f"stats over {len(files)} files / {n} frames -> {args.out} "
          f"shape={stats.shape}")


if __name__ == "__main__":
    main()
