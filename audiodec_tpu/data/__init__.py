from audiodec_tpu.data.wav import (read_wav, read_wav_pcm16, write_wav,
                                   wav_info)
from audiodec_tpu.data.dataset import SingleDataset, MultiDataset, find_files
from audiodec_tpu.data.collate import CollaterAudio, CollaterAudioPair
