"""Audio datasets (capability twin of ref dataloader/dataset.py:20-152,
dataloader/utils.py:18-47) without a torch DataLoader dependency.

`SingleDataset`/`MultiDataset` are simple indexable collections returning
float32 (T, C) numpy arrays; batching/shuffling/prefetch live in
`audiodec_tpu.data.loader`.
"""

from __future__ import annotations

import fnmatch
import os
from typing import List, Optional, Sequence

import numpy as np

from audiodec_tpu.data.wav import read_wav


def find_files(root_dir: str, query: str = "*.wav",
               include_root_dir: bool = True) -> List[str]:
    """Recursive glob (ref: dataloader/utils.py:18-38)."""
    files = []
    for root, _, filenames in os.walk(root_dir, followlinks=True):
        for filename in fnmatch.filter(filenames, query):
            files.append(os.path.join(root, filename))
    files = sorted(files)
    if not include_root_dir:
        files = [f.replace(root_dir + "/", "") for f in files]
    return files


def _load_list(files) -> List[str]:
    """Directory glob / list-file / python list
    (ref: dataloader/dataset.py:63-77)."""
    if isinstance(files, (list, tuple)):
        return list(files)
    if os.path.isdir(files):
        return find_files(files)
    if os.path.isfile(files):
        with open(files) as f:
            return [line.strip() for line in f if line.strip()]
    raise ValueError(f"{files} is not a directory, list file, or list")


def load_files(data_path, query: str = "*.wav", num_core: int = 1):
    """File list, optionally split into num_core roughly equal chunks
    (ref: dataloader/utils.py:41-47)."""
    files = _load_list(data_path) if not os.path.isdir(data_path) \
        else find_files(data_path, query)
    if num_core <= 1:
        return files
    file_lists = [files[i::num_core] for i in range(num_core)]
    return file_lists


class SingleDataset:
    """Single-corpus waveform dataset (ref: dataloader/dataset.py:20-96)."""

    def __init__(self, files, query: str = "*.wav", load_fn: str = "audio",
                 return_utt_id: bool = False, subset_num: int = -1):
        self.return_utt_id = return_utt_id
        self.load_fn = load_fn
        self.filenames = _load_list(files)
        if subset_num > 0:
            self.filenames = self.filenames[:subset_num]
        assert len(self.filenames) != 0, f"File list in empty! ({files})"
        self.utt_ids = [os.path.splitext(os.path.basename(f))[0]
                        for f in self.filenames]

    def __len__(self):
        return len(self.filenames)

    def num_frames(self, idx: int) -> int:
        """Utterance length in samples without decoding the audio (native
        wav_info reads only the header; npy via the array header).  Lets
        batch planners bucket a large corpus by length in O(header) I/O."""
        if self.load_fn == "npy":
            return int(np.load(self.filenames[idx], mmap_mode="r").shape[0])
        from audiodec_tpu.data.wav import wav_info
        _, _, frames = wav_info(self.filenames[idx])
        return frames

    def _load(self, idx: int) -> np.ndarray:
        if self.load_fn == "npy":
            return np.load(self.filenames[idx]).astype(np.float32)
        data, _ = read_wav(self.filenames[idx])
        return data  # (T, C) float32

    def __getitem__(self, idx: int):
        data = self._load(idx)
        if self.return_utt_id:
            return self.utt_ids[idx], data
        return data


class MultiDataset:
    """N parallel corpora, e.g. (noisy, clean) pairs with matching utt lists
    (ref: dataloader/dataset.py:99-152)."""

    def __init__(self, multi_files: Sequence, queries=None,
                 load_fns=None, return_utt_id: bool = False):
        n = len(multi_files)
        load_fns = load_fns or ["audio"] * n
        self.datasets = [
            SingleDataset(multi_files[i], load_fn=load_fns[i],
                          return_utt_id=False)
            for i in range(n)]
        lengths = {len(d) for d in self.datasets}
        assert len(lengths) == 1, \
            f"Corpora lengths differ: {[len(d) for d in self.datasets]}"
        self.return_utt_id = return_utt_id

    def __len__(self):
        return len(self.datasets[0])

    def __getitem__(self, idx: int):
        items = [d[idx] for d in self.datasets]
        if self.return_utt_id:
            return self.datasets[0].utt_ids[idx], items
        return items
