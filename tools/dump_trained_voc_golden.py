"""Dump the trained AD-v1 golden: reference-trained HiFiGAN vocoder decoding
the trained analyzer's codes on held-out audio.

Pipeline pinned (ref: codecTest.py:64-95 + utils/audiodec.py:100-106):
analyzer encoder -> projector -> quantizer -> zq  -> vocoder (stats-
normalized input) -> waveform, in batch forward, whole-signal streaming,
and hop-by-hop streaming forms.  Both models were trained by the
reference's own trainer (tools/ref_train.py): the analyzer for 3000+100
steps, the vocoder for 400 adversarial steps against the frozen analyzer —
so weight-norm g/v and stats buffers are genuinely trained.

Usage:
  python tools/dump_trained_voc_golden.py \
      --analyzer exp_ref/symAD_short/checkpoint-3000steps.pkl \
      --voc exp_ref/voc_v1_short/checkpoint-400steps.pkl \
      --voc-config exp_ref/voc_v1_short/config.yml \
      --wav data/synth_ref/test/test_0001.wav \
      --out tests/golden/voc_v1_trained.npz
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
    ap.add_argument("--analyzer", required=True)
    ap.add_argument("--voc", required=True)
    ap.add_argument("--voc-config", required=True)
    ap.add_argument("--wav", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seconds", type=float, default=1.0)
    args = ap.parse_args()

    from models.autoencoder.AudioDec import Generator as AEGenerator
    from models.vocoder.HiFiGAN import StreamGenerator as VocStream

    from audiodec_tpu.data.wav import read_wav

    with open(args.voc_config) as f:
        vconfig = yaml.safe_load(f)
    with open(os.path.join(os.path.dirname(args.analyzer), "config.yml")) as f:
        aconfig = yaml.safe_load(f)

    analyzer = AEGenerator(**aconfig["generator_params"])
    analyzer.load_state_dict(
        torch.load(args.analyzer, map_location="cpu",
                   weights_only=True)["model"]["generator"])
    analyzer.eval()

    voc = VocStream(**vconfig["generator_params"])
    vstate = torch.load(args.voc, map_location="cpu", weights_only=True)
    voc.load_state_dict(vstate["model"]["generator"])
    voc.eval()

    wav, sr = read_wav(args.wav)
    hop = int(np.prod(aconfig["generator_params"]["enc_strides"]))
    T = (min(int(args.seconds * sr), wav.shape[0]) // hop) * hop
    x = wav[:T, :1].T[None].astype(np.float32)
    xt = torch.tensor(x)

    with torch.no_grad():
        # build the flat codebook for encode() (ref: vq_module.py:151-157)
        if hasattr(analyzer.quantizer, "initial"):
            analyzer.quantizer.initial()
        else:
            analyzer.quantizer.codebook.initial()
        h = analyzer.encoder(xt)
        z = analyzer.projector(h)
        zq, vqloss, ppl = analyzer.quantizer(z)
        _, idx = analyzer.quantizer.encode(z)

        y = voc(zq)                                   # batch forward

        voc.reset_buffer()
        ys = voc.decode(zq.transpose(2, 1))           # buffered streaming

        voc.reset_buffer()                            # hop-by-hop
        chunks = []
        n_hops = min(6, zq.shape[2])
        for i in range(n_hops):
            chunks.append(voc.decode(
                zq[:, :, i:i + 1].transpose(2, 1)).numpy())
        y_hops = np.concatenate(chunks, axis=-1)

    sd = {k: v.detach().cpu().numpy() for k, v in voc.state_dict().items()}
    np.savez_compressed(
        args.out,
        x=x, zq=zq.numpy(), idx=idx.numpy(),
        y=y.numpy(), y_stream=ys.numpy(), y_hops=y_hops,
        n_hops=np.array(n_hops),
        trained_steps=np.array(int(vstate.get("steps", -1))),
        **{"sd__" + k: v for k, v in sd.items()})
    print(f"trained voc golden: steps={vstate.get('steps')} T={T} "
          f"zq={tuple(zq.shape)} y={tuple(y.shape)} -> {args.out}")


if __name__ == "__main__":
    main()
