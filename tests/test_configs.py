"""All shipped YAML configs parse into valid model/discriminator configs and
match the reference's canonical hyperparameters."""

import glob
import os

import pytest

from audiodec_tpu.models.autoencoder import GeneratorConfig
from audiodec_tpu.models.vocoder import VocoderConfig
from audiodec_tpu.utils.config import (
    discriminator_config,
    generator_config,
    load_config,
)

ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")


def _all_configs():
    return sorted(glob.glob(os.path.join(ROOT, "*", "*.yaml")))


def test_found_all_config_families():
    fams = {os.path.basename(os.path.dirname(p)) for p in _all_configs()}
    assert {"autoencoder", "vocoder", "statistic", "denoise"} <= fams


@pytest.mark.parametrize("path", _all_configs())
def test_config_parses(path):
    cfg = load_config(path)
    assert "inherit" not in cfg
    if "statistic" in path:
        assert "analyzer" in cfg and "stats" in cfg
        return
    gen = generator_config(cfg)
    if cfg["model_type"] in ("symAudioDec", "symAudioDecUniv"):
        assert isinstance(gen, GeneratorConfig)
    else:
        assert isinstance(gen, VocoderConfig)
    disc = discriminator_config(cfg)
    assert disc is not None


def test_canonical_symad_values():
    cfg = load_config(os.path.join(
        ROOT, "autoencoder", "symAD_vctk_48000_hop300.yaml"))
    g = generator_config(cfg)
    assert g.hop_length == 300
    assert g.codebook_num == 8 and g.codebook_size == 1024
    assert g.code_dim == 64 and g.enc_out_channels == 512
    assert g.receptive_field == 7209  # ref utils/audiodec.py:24
    # bitrate: 48000/300 * 8 books * 10 bits = 12.8 kbps (ref README.md:6)
    assert 48000 / g.hop_length * g.codebook_num * 10 == 12800


def test_variant_inheritance():
    c16 = load_config(os.path.join(
        ROOT, "autoencoder", "symAD_c16_vctk_48000_hop320.yaml"))
    g = generator_config(c16)
    assert g.codebook_num == 16 and g.hop_length == 320
    assert c16["batch_length"] == 96000

    v1 = load_config(os.path.join(
        ROOT, "vocoder", "AudioDec_v1_symAD_vctk_48000_hop300_clean.yaml"))
    gv = generator_config(v1)
    assert gv.grouped  # v1 uses MultiGroupConv1d (ref HiFiGAN.py:77-81)
    v0 = load_config(os.path.join(
        ROOT, "vocoder", "AudioDec_v0_symAD_vctk_48000_hop300_clean.yaml"))
    assert not generator_config(v0).grouped
    v3 = load_config(os.path.join(
        ROOT, "vocoder", "AudioDec_v3_symADuniv_vctk_48000_hop300_clean.yaml"))
    assert v3["model_type"] == "UnivNet"
    from audiodec_tpu.models.discriminators import UnivNetDiscriminatorConfig
    assert isinstance(discriminator_config(v3), UnivNetDiscriminatorConfig)
