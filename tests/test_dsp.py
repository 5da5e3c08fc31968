"""DSP invariants: round trips, shape contracts, librosa-convention checks."""
import glob

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.signal import stft as scipy_stft

from tacotron_wavenet_vocoder_korean_tpu.config import AudioConfig
from tacotron_wavenet_vocoder_korean_tpu import dsp

CFG = AudioConfig()
REF_WAVS = sorted(glob.glob("/root/reference/datasets/moon/audio/*.wav"))


def _tone(sr=24000, dur=0.8, f=440.0):
    t = np.arange(int(sr * dur)) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_stft_shape_and_frames():
    y = _tone()
    S = dsp.stft(jnp.asarray(y), CFG)
    assert S.shape[0] == CFG.num_freq
    # center=True => 1 + len//hop frames (librosa convention)
    assert S.shape[1] == 1 + len(y) // CFG.hop_size


def test_stft_peak_bin():
    # 440 Hz tone peaks at bin round(440/ (sr/fft)) = round(440/11.71) = 38
    y = _tone(f=440.0)
    S = np.abs(np.asarray(dsp.stft(jnp.asarray(y), CFG)))
    peak_bins = S[:, 2:-2].argmax(axis=0)
    assert np.all(np.abs(peak_bins - 440 * CFG.fft_size / CFG.sample_rate) <= 1)


def test_istft_roundtrip():
    y = _tone()
    S = dsp.stft(jnp.asarray(y), CFG)
    y2 = np.asarray(dsp.istft(S, CFG, length=len(y)))
    # interior should reconstruct nearly exactly
    err = np.abs(y2[1000:-1000] - y[1000:-1000]).max()
    assert err < 1e-3


def test_preemphasis_roundtrip():
    y = _tone()
    z = dsp.preemphasis(jnp.asarray(y), 0.97)
    y2 = np.asarray(dsp.inv_preemphasis(z, 0.97))
    assert np.abs(y2 - y).max() < 1e-4


def test_normalize_denormalize_roundtrip():
    S = np.random.RandomState(0).uniform(
        CFG.min_level_db, 0, size=(80, 50)).astype(np.float32)
    N = dsp.normalize(jnp.asarray(S), CFG)
    assert float(jnp.max(jnp.abs(N))) <= CFG.max_abs_value + 1e-5
    D = np.asarray(dsp.denormalize(N, CFG))
    assert np.abs(D - S).max() < 1e-3


def test_mel_basis_matches_librosa_properties():
    basis = dsp.mel_basis(24000, 2048, 80)
    assert basis.shape == (80, 1025)
    assert basis.min() >= 0
    # every filter has nonzero support and peaks are monotonically increasing
    peaks = basis.argmax(axis=1)
    assert np.all(np.diff(peaks) > 0)
    assert basis.sum(axis=1).min() > 0


def test_spectrogram_extractors():
    y = _tone()
    mel = dsp.mel_spectrogram(jnp.asarray(y), CFG)
    lin = dsp.linear_spectrogram(jnp.asarray(y), CFG)
    assert mel.shape[0] == CFG.num_mels
    assert lin.shape[0] == CFG.num_freq
    assert mel.shape[1] == lin.shape[1]
    assert float(jnp.max(mel)) <= CFG.max_abs_value + 1e-5
    assert float(jnp.min(mel)) >= -CFG.max_abs_value - 1e-5


def test_mulaw_roundtrip():
    x = np.linspace(-1, 1, 1001).astype(np.float32)
    y = dsp.mulaw(jnp.asarray(x))
    x2 = np.asarray(dsp.inv_mulaw(y))
    assert np.abs(x2 - x).max() < 1e-5

    q = dsp.mulaw_quantize(jnp.asarray(x))
    assert int(jnp.min(q)) >= 0 and int(jnp.max(q)) <= 255
    x3 = np.asarray(dsp.inv_mulaw_quantize(q))
    assert np.abs(x3 - x).max() < 0.05  # truncation error peaks near |x|=1

    e = dsp.mulaw_encode(jnp.asarray(x), 256)
    assert int(jnp.min(e)) >= 0 and int(jnp.max(e)) <= 255
    x4 = np.asarray(dsp.mulaw_decode(e, 256))
    assert np.abs(x4 - x).max() < 0.05
    # zero maps to midpoint
    assert int(dsp.mulaw_encode(jnp.zeros(()), 256)) in (127, 128)


def test_griffin_lim_reconstruction():
    y = _tone(dur=0.5)
    lin = dsp.linear_spectrogram(jnp.asarray(y), CFG)
    y2 = np.asarray(dsp.inv_linear_spectrogram(lin, CFG))
    # a pure tone should reconstruct with the right dominant frequency
    spec = np.abs(np.fft.rfft(y2))
    f = spec.argmax() * CFG.sample_rate / len(y2)
    assert abs(f - 440) < 5


@pytest.mark.skipif(not REF_WAVS, reason="bundled corpus not present")
def test_load_trim_real_wav():
    wav = dsp.load_wav(REF_WAVS[0], CFG.sample_rate)
    assert wav.dtype == np.float32 and wav.ndim == 1 and len(wav) > 1000
    r = dsp.rescale(wav, CFG)
    assert abs(np.abs(r).max() - CFG.rescaling_max) < 1e-4
    t = dsp.trim_silence(r, CFG)
    assert 0 < len(t) <= len(r)


def test_scipy_cross_check():
    """STFT magnitudes agree with scipy.signal.stft up to framing/scale."""
    y = _tone()
    ours = np.abs(np.asarray(dsp.stft(jnp.asarray(y), CFG)))
    # scipy uses scaled windows; compare shapes of spectra at matching frames
    f, t, Z = scipy_stft(y, nperseg=CFG.win_size, noverlap=CFG.win_size - CFG.hop_size,
                         nfft=CFG.fft_size, boundary=None, padded=False)
    sp = np.abs(Z)
    # correlation of log-spectra at a middle frame should be ~1
    a = np.log(ours[:, ours.shape[1] // 2] + 1e-8)
    b = np.log(sp[:, sp.shape[1] // 2] + 1e-8)
    c = np.corrcoef(a, b)[0, 1]
    assert c > 0.95


def test_extract_features_exact_vs_reference_path():
    """Bucketed extractor must match the unbucketed jnp path bit-for-bit-ish."""
    rng = np.random.RandomState(7)
    for n in (9001, 24000, 38399, 38400):
        y = rng.randn(n).astype(np.float32) * 0.3
        mel_b, lin_b = dsp.extract_features(y, CFG)
        mel_r = np.asarray(dsp.mel_spectrogram(jnp.asarray(y), CFG))
        lin_r = np.asarray(dsp.linear_spectrogram(jnp.asarray(y), CFG))
        assert mel_b.shape == mel_r.shape
        assert np.abs(mel_b - mel_r).max() < 2e-4
        assert np.abs(lin_b - lin_r).max() < 2e-4
