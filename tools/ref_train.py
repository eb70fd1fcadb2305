"""Run the ACTUAL reference trainer (/root/reference/codecTrain.py) on CPU.

Used to produce genuinely *trained* reference checkpoints (EMA codebooks,
weight-normed vocoder kernels) for end-to-end trained-weights parity:
reference trainer -> trainer-layout pkl (ref: trainer/trainerGAN.py:95-121)
-> tools/import_ckpt.py -> bit-exact index / SNR assertions.

The image lacks torchaudio and soundfile; both are stubbed (torchaudio is
only needed by the UnivNet spectral discriminator import, soundfile by the
dataloader).  The soundfile stub delegates to our own WAV IO.

Usage:
  python tools/ref_train.py -c <config.yaml> --tag <tag> --exp_root <dir>
"""

import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONDONTWRITEBYTECODE", "1")
sys.dont_write_bytecode = True


def install_stubs():
    import numpy as np

    from audiodec_tpu.data.wav import read_wav, write_wav

    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        ta.functional = types.ModuleType("torchaudio.functional")
        ta.functional.spectrogram = None
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.functional"] = ta.functional

    if "librosa" not in sys.modules:
        # reference only uses librosa.filters.mel (ref: losses/mel_loss.py:54);
        # our mel_filterbank is the librosa-equivalent slaney implementation
        # (returns the transpose of librosa's layout).
        from audiodec_tpu.ops.spectral import mel_filterbank

        lr = types.ModuleType("librosa")
        lr.filters = types.ModuleType("librosa.filters")

        def mel(sr, n_fft, n_mels, fmin=0.0, fmax=None):
            fmax = sr / 2 if fmax is None else fmax
            m = mel_filterbank(int(sr), int(n_fft), int(n_mels),
                               float(fmin), float(fmax))
            return np.asarray(m, dtype=np.float32).T

        lr.filters.mel = mel
        sys.modules["librosa"] = lr
        sys.modules["librosa.filters"] = lr.filters

    if "soundfile" not in sys.modules:
        sf = types.ModuleType("soundfile")

        def read(path, always_2d=False, dtype="float64"):
            x, sr = read_wav(path)  # (T, C) float32 in [-1, 1]
            x = x.astype(dtype)
            if not always_2d and x.shape[1] == 1:
                x = x[:, 0]
            return x, sr

        def write(path, data, samplerate, subtype=None):
            write_wav(path, np.asarray(data), samplerate)

        sf.read = read
        sf.write = write
        sys.modules["soundfile"] = sf


def register_reference_packages():
    """The reference's top-level dirs (bin/, models/, trainer/, layers/,
    utils/) have no __init__.py; regular packages elsewhere on sys.path
    (e.g. site-packages/bin) would shadow these namespace portions, so pin
    them explicitly."""
    for name in ("bin", "models", "trainer", "layers", "utils"):
        path = os.path.join("/root/reference", name)
        if os.path.isdir(path) and name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [path]
            sys.modules[name] = mod


def main():
    install_stubs()
    import torch

    torch.set_num_threads(max(1, os.cpu_count()))
    sys.path.insert(0, "/root/reference")
    register_reference_packages()
    import codecTrain

    codecTrain.main()


if __name__ == "__main__":
    main()
