"""Corpus preprocessing: wav + transcript -> one .npz training example.

Parity with reference datasets/moon.py:11-178 / son.py (identical but for the
JSON filename): load/rescale/trim, mel + linear extraction, reflect-pad and
crop audio to ``mel_frames * hop_size`` (the transposed-conv upsampling
invariant), and save the same 8 keys per utterance:
``audio, mel, linear, time_steps, mel_frames, text, tokens, loss_coeff``.

The DSP runs through the shared jittable library (identical math to
synthesis); fan-out across utterances uses a process pool as in the reference.
"""
from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from typing import List, Optional, Tuple

import numpy as np

from ..config import Config
from .. import dsp
from ..text import TextCodec

Example = Tuple[str, int, int, str]   # (npz_filename, time_steps, mel_frames, text)


def _process_utterance(out_dir: str, wav_path: str, text: str,
                       cfg: Config) -> Optional[Example]:
    """One utterance -> one npz (reference datasets/moon.py:52-178)."""
    audio_cfg = cfg.audio
    wavenet_cfg = cfg.wavenet
    try:
        wav = dsp.load_wav(wav_path, audio_cfg.sample_rate)
    except FileNotFoundError:
        print(f"missing wav, skipping: {wav_path}")
        return None

    if audio_cfg.rescaling:
        wav = dsp.rescale(wav, audio_cfg)
    if audio_cfg.trim_silence:
        wav = dsp.trim_silence(wav, audio_cfg)
    if len(wav) < audio_cfg.hop_size * 4:
        return None

    input_type = wavenet_cfg.input_type
    if input_type == "mulaw-quantize":
        out = np.asarray(dsp.mulaw_quantize(wav, wavenet_cfg.quantization_channels))
        start, end = dsp.start_and_end_indices(out, wavenet_cfg.silence_threshold)
        wav, out = wav[start:end], out[start:end]
        constant_values = int(dsp.mulaw_quantize(
            np.zeros(()), wavenet_cfg.quantization_channels))
        out_dtype = np.int16
    elif input_type == "mulaw":
        out = np.asarray(dsp.mulaw(wav, wavenet_cfg.quantization_channels))
        constant_values = float(dsp.mulaw(0.0, wavenet_cfg.quantization_channels))
        out_dtype = np.float32
    else:  # raw
        out = wav
        constant_values = 0.0
        out_dtype = np.float32

    # Bucketed jitted extraction: identical numbers to
    # mel_spectrogram/linear_spectrogram but a few compiles total.
    mel, linear = dsp.extract_features(wav, audio_cfg)
    mel = mel.astype(np.float32)
    linear = linear.astype(np.float32)
    mel_frames = mel.shape[1]
    if audio_cfg.clip_mels_length and mel_frames > audio_cfg.max_mel_frames:
        return None
    assert linear.shape[1] == mel_frames

    # Reflect-pad like librosa's centered STFT, then crop so
    # len(audio) == mel_frames * hop (reference datasets/moon.py:133-146).
    pad = audio_cfg.fft_size // 2
    out = np.pad(out, pad, mode="reflect")
    assert len(out) >= mel_frames * audio_cfg.hop_size
    out = out[:mel_frames * audio_cfg.hop_size]
    assert len(out) % audio_cfg.hop_size == 0
    time_steps = len(out)

    codec = TextCodec(cfg.tacotron.cleaners)
    wav_id = os.path.splitext(os.path.basename(wav_path))[0]
    npz_filename = f"{wav_id}.npz"
    np.savez(
        os.path.join(out_dir, npz_filename),
        audio=out.astype(out_dtype),
        mel=mel.T,                      # [frames, num_mels]
        linear=linear.T,                # [frames, num_freq]
        time_steps=time_steps,
        mel_frames=mel_frames,
        text=text,
        tokens=codec.encode(text),
        loss_coeff=1,
        allow_pickle=False,
    )
    return (npz_filename, time_steps, mel_frames, text)


def build_from_json_corpus(cfg: Config, in_dir: str, out_dir: str,
                           json_name: str, num_workers: int = 1,
                           tqdm=lambda x: x) -> List[Example]:
    """Build from a ``{wav_path: transcript}`` JSON map (moon/son format,
    reference datasets/moon.py:11-44)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(in_dir, json_name), encoding="utf-8") as f:
        data = json.load(f)

    jobs = []
    for key, text in data.items():
        wav_path = os.path.join(in_dir, "audio", key.strip().split("/")[-1])
        if not os.path.exists(wav_path):
            continue
        jobs.append((wav_path, text))
    return _run_jobs(jobs, out_dir, cfg, num_workers, tqdm)


def _run_jobs(jobs, out_dir: str, cfg: Config, num_workers: int,
              tqdm) -> List[Example]:
    if num_workers <= 1:
        results = [_process_utterance(out_dir, w, t, cfg) for w, t in tqdm(jobs)]
    else:
        # Threads, not processes: jax is already initialized in this process
        # (forking would deadlock), releases the GIL during compute, and all
        # workers share one jit cache for the bucketed feature extractor.
        with ThreadPoolExecutor(max_workers=num_workers) as ex:
            futures = [ex.submit(partial(_process_utterance, out_dir), w, t, cfg)
                       for w, t in jobs]
            results = [f.result() for f in tqdm(futures)]
    return [r for r in results if r is not None]


def build_moon(cfg: Config, in_dir: str, out_dir: str, num_workers: int = 1,
               tqdm=lambda x: x) -> List[Example]:
    return build_from_json_corpus(cfg, in_dir, out_dir,
                                  "moon-recognition-All.json", num_workers, tqdm)


def build_son(cfg: Config, in_dir: str, out_dir: str, num_workers: int = 1,
              tqdm=lambda x: x) -> List[Example]:
    return build_from_json_corpus(cfg, in_dir, out_dir,
                                  "son-recognition-All.json", num_workers, tqdm)


def build_ljspeech(cfg: Config, in_dir: str, out_dir: str,
                   num_workers: int = 1, tqdm=lambda x: x) -> List[Example]:
    """LJSpeech-1.1 layout: ``metadata.csv`` rows ``id|raw|normalized`` with
    wavs at ``wavs/<id>.wav``.

    The reference CLI advertises ``--name ljspeech`` (preprocess.py:42) but
    ships no datasets/ljspeech.py module; this builder completes that path
    with the same npz contract as moon/son.  Use ``english_cleaners`` in
    ``cfg.tacotron.cleaners`` so the ASCII symbol table is selected.
    """
    os.makedirs(out_dir, exist_ok=True)
    jobs = []
    with open(os.path.join(in_dir, "metadata.csv"), encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("|")
            if len(parts) < 2:
                continue
            wav_id, text = parts[0], parts[-1] or parts[1]
            wav_path = os.path.join(in_dir, "wavs", wav_id + ".wav")
            if os.path.exists(wav_path):
                jobs.append((wav_path, text))
    return _run_jobs(jobs, out_dir, cfg, num_workers, tqdm)


def build_cmu_arctic(cfg: Config, in_dir: str, out_dir: str,
                     num_workers: int = 1, tqdm=lambda x: x) -> List[Example]:
    """CMU ARCTIC layout: ``wav/<id>.wav`` plus festival prompt file
    ``etc/txt.done.data`` with rows ``( arctic_a0001 "Transcript." )``.

    The reference CLI asserts ``--name cmu_arctic`` is valid
    (preprocess.py:59) but ships no datasets/cmu_arctic.py module; this
    builder completes that path with the same npz contract as moon/son.
    Use ``english_cleaners`` in ``cfg.tacotron.cleaners``.
    """
    import re
    os.makedirs(out_dir, exist_ok=True)
    prompt_path = os.path.join(in_dir, "etc", "txt.done.data")
    row = re.compile(r'^\(\s*(\S+)\s+"(.*)"\s*\)\s*$')
    jobs = []
    with open(prompt_path, encoding="utf-8") as f:
        for line in f:
            m = row.match(line.strip())
            if not m:
                continue
            wav_id, text = m.group(1), m.group(2)
            wav_path = os.path.join(in_dir, "wav", wav_id + ".wav")
            if os.path.exists(wav_path):
                jobs.append((wav_path, text))
    return _run_jobs(jobs, out_dir, cfg, num_workers, tqdm)


CORPUS_BUILDERS = {
    "moon": build_moon,
    "son": build_son,
    "ljspeech": build_ljspeech,
    "cmu_arctic": build_cmu_arctic,
}


def write_metadata(examples: List[Example], out_dir: str, cfg: Config) -> None:
    """train.txt + corpus stats (reference preprocess.py:25-37)."""
    with open(os.path.join(out_dir, "train.txt"), "w", encoding="utf-8") as f:
        for ex in examples:
            f.write("|".join(str(x) for x in ex) + "\n")
    frames = sum(ex[2] for ex in examples)
    hours = frames * cfg.audio.frame_shift_ms / (3600 * 1000)
    print(f"Wrote {len(examples)} utterances, {frames} frames ({hours:.2f} hours)")
    if examples:
        print(f"Max mel frames: {max(ex[2] for ex in examples)}")
        print(f"Max audio timesteps: {max(ex[1] for ex in examples)}")


def preprocess_corpus(cfg: Config, name: str, in_dir: str, out_dir: str,
                      num_workers: int = 1) -> List[Example]:
    """Dispatch by corpus name (reference preprocess.py:19-24)."""
    if name not in CORPUS_BUILDERS:
        raise KeyError(f"unknown corpus {name!r}; have {sorted(CORPUS_BUILDERS)}")
    try:
        from tqdm import tqdm as _tqdm
    except ImportError:
        _tqdm = lambda x: x
    examples = CORPUS_BUILDERS[name](cfg, in_dir, out_dir, num_workers, _tqdm)
    write_metadata(examples, out_dir, cfg)
    return examples
