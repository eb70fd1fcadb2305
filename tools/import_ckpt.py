"""Convert a reference PyTorch checkpoint (.pkl) into a framework checkpoint.

Maps the torch state_dict onto our param pytrees (layout conversion +
weight-norm folding, see audiodec_tpu/utils/torch_import.py) and writes a
checkpoint loadable by the CLIs, with the matching config.yml copied next to
it (the reference's config-rides-with-checkpoint convention,
ref: bin/utils.py:17-22).

Usage:
  python tools/import_ckpt.py --torch checkpoint-200000steps.pkl \
      --config config.yml --out exp/.../checkpoint-200000steps.ckpt
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--torch", required=True, help="torch .pkl checkpoint")
    parser.add_argument("--config", required=True,
                        help="reference config.yml for the model")
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    from audiodec_tpu.train.checkpoint import save_checkpoint
    from audiodec_tpu.utils.config import generator_config, load_config
    from audiodec_tpu.utils.torch_import import (
        import_autoencoder,
        import_vocoder,
        load_torch_checkpoint,
        load_torch_meta,
    )

    config = load_config(args.config)
    cfg = generator_config(config)
    sd = load_torch_checkpoint(args.torch)
    meta = load_torch_meta(args.torch)
    if config.get("model_type") in ("HiFiGAN", "UnivNet"):
        params = import_vocoder(sd, cfg)
    else:
        params = import_autoencoder(sd, cfg)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    # steps/epochs ride the header like the reference's pickle dict keeps
    # them next to the weights (ref: trainer/trainerGAN.py:95-121)
    save_checkpoint(args.out, {"gen": params},
                    steps=meta.get("steps", 0),
                    extra={"imported_from": os.path.basename(args.torch),
                           "epochs": meta.get("epochs", 0)})
    dst = os.path.join(os.path.dirname(os.path.abspath(args.out)),
                       "config.yml")
    if os.path.abspath(args.config) != dst:
        shutil.copy(args.config, dst)
    print(f"imported {args.torch} -> {args.out}")


if __name__ == "__main__":
    main()
