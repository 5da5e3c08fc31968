"""End-to-end TTS: text -> Tacotron mel -> WaveNet waveform.

Glues the two inference stages (reference workflow: synthesizer.py produces a
mel .npy consumed by generate.py; here one call does both in-process, keeping
the mel on device).
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Union

from .synthesizer import Synthesizer
from .generator import WaveNetGenerator
from .. import dsp


class TTSPipeline:
    def __init__(self):
        self.synth = Synthesizer()
        self.vocoder: Optional[WaveNetGenerator] = None

    def load(self, tacotron_dir: str, wavenet_dir: Optional[str] = None,
             fused_rnn: bool = False) -> "TTSPipeline":
        self.synth.load(tacotron_dir, fused_rnn=fused_rnn)
        if wavenet_dir:
            self.vocoder = WaveNetGenerator().load(wavenet_dir)
        return self

    def tts(self, texts: Union[str, Sequence[str]],
            base_path: Optional[str] = None,
            speaker_ids: Optional[Sequence[int]] = None,
            use_wavenet: bool = True) -> List[dict]:
        """Synthesize; Griffin-Lim wav always produced, plus WaveNet wav when
        a vocoder is loaded."""
        results = self.synth.synthesize(texts, base_path=base_path,
                                        speaker_ids=speaker_ids)
        if use_wavenet and self.vocoder is not None:
            # Vocode every utterance in ONE batched kernel launch (ragged
            # mels are silence-padded to the longest inside generate): a
            # per-utterance loop would recompile the generation kernel for
            # each distinct mel length, minutes apiece over the tunnel.
            for start in range(0, len(results), 8):
                chunk = results[start:start + 8]
                sids = (list(speaker_ids[start:start + 8])
                        if speaker_ids else None)
                wavs = self.vocoder.generate([r["mel"] for r in chunk],
                                             speaker_id=sids)
                # generate() is list-in/list-out; a silent length mismatch
                # would assign wavs to the wrong utterances
                assert len(wavs) == len(chunk), (len(wavs), len(chunk))
                for off, (r, wav) in enumerate(zip(chunk, wavs)):
                    idx = start + off
                    r["wavenet_wav"] = wav
                    if base_path:
                        path = os.path.join(base_path, f"{idx}.wavenet.wav")
                        dsp.save_wav(wav, path,
                                     self.synth.cfg.audio.sample_rate)
                        r["wavenet_wav_path"] = path
        return results
