import dataclasses

import pytest

from tacotron_wavenet_vocoder_korean_tpu import config as C


def test_defaults_valid():
    cfg = C.Config()
    assert cfg.audio.num_freq == 1025
    assert cfg.audio.frame_shift_ms == 12.5
    # Receptive field matches reference wavenet/model.py:32-39 arithmetic:
    # (2-1)*sum(dilations) + 1 + (initial_filter_width-1) = 5115+1+31.
    assert cfg.wavenet.receptive_field == 5147


def test_invariant_upsample_factor():
    with pytest.raises(ValueError):
        C.Config(wavenet=C.WaveNetConfig(upsample_factor=(4, 5, 12)))


def test_invariant_out_channels():
    with pytest.raises(ValueError):
        C.Config(wavenet=C.WaveNetConfig(out_channels=31))


def test_invariant_input_type():
    with pytest.raises(ValueError):
        C.Config(wavenet=C.WaveNetConfig(input_type="mulaw-quantize",
                                         scalar_input=True))


def test_json_round_trip(tmp_path):
    cfg = C.Config(tacotron=C.TacotronConfig(num_speakers=2, batch_size=4))
    C.save_config(cfg, str(tmp_path))
    loaded = C.load_config(str(tmp_path))
    assert loaded == cfg
    assert isinstance(loaded.wavenet.dilations, tuple)


def test_overlay():
    cfg = C.Config()
    cfg2 = C.overlay(cfg, tacotron={"batch_size": 8}, audio={"num_mels": 40})
    assert cfg2.tacotron.batch_size == 8
    assert cfg2.audio.num_mels == 40
    assert cfg.tacotron.batch_size == 32  # original untouched


def test_overlay_from_strings():
    """--hparams style group.key=value overrides (CLI parity with the
    reference's hparams.parse strings)."""
    cfg = C.overlay_from_strings(C.Config(), [
        "tacotron.fused_rnn=True", "tacotron.batch_size=8",
        "train.num_test_per_speaker=20", "wavenet.input_type=mulaw",
        "tacotron.compute_dtype=bfloat16"])
    assert cfg.tacotron.fused_rnn is True
    assert cfg.tacotron.batch_size == 8
    assert cfg.train.num_test_per_speaker == 20
    assert cfg.wavenet.input_type == "mulaw"
    assert cfg.tacotron.compute_dtype == "bfloat16"
    with pytest.raises(KeyError):
        C.overlay_from_strings(C.Config(), ["tacotron.nope=1"])
    with pytest.raises(KeyError):
        C.overlay_from_strings(C.Config(), ["nope.x=1"])
    with pytest.raises(ValueError):
        C.overlay_from_strings(C.Config(), ["batch_size=8"])


def test_split_overrides_bracket_aware():
    """--hparams splitting must not break list values on their commas
    (reference hparams.parse handles bracketed lists the same way)."""
    assert C.split_overrides(
        "wavenet.dilations=[1,2,4],tacotron.adam_beta1=0.9") == [
            "wavenet.dilations=[1,2,4]", "tacotron.adam_beta1=0.9"]
    assert C.split_overrides("a.b=1") == ["a.b=1"]
    assert C.split_overrides(" a.b=1 , c.d=[2,3] ") == ["a.b=1", "c.d=[2,3]"]
    cfg = C.overlay_from_strings(
        C.Config(), C.split_overrides(
            "wavenet.dilations=[1,2,4,8],tacotron.batch_size=8"))
    assert tuple(cfg.wavenet.dilations) == (1, 2, 4, 8)
    assert cfg.tacotron.batch_size == 8


def test_frozen():
    cfg = C.Config()
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.audio.sample_rate = 16000
