#!/usr/bin/env python
"""WaveNet waveform generation CLI (reference: generate.py:38-264).

Example:
    python generate.py --load_path logs/wavenet --mel workdir/synth/0.mel.npy \\
        --out out.wav

Multiple --mel inputs are vocoded together through the batched kernel
(up to 8 ragged-length streams per launch, reference generate.py:120-137).
``--wav_seed`` primes the queues from seed audio (reference generate.py:66)
and ``--temperature`` shapes softmax sampling (reference generate.py:55).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tacotron_wavenet_vocoder_korean_tpu.synth.generator import WaveNetGenerator


from tacotron_wavenet_vocoder_korean_tpu.utils.misc import (
    add_platform_arg, set_platform,
    enable_compilation_cache)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--load_path", required=True, help="wavenet run dir")
    p.add_argument("--mel", action="append", required=True,
                   help="mel .npy from the synthesizer (repeatable; up to 8 "
                        "are vocoded per batched kernel launch)")
    p.add_argument("--out", default=None,
                   help="output wav (default: <mel>.gen.wav)")
    p.add_argument("--gc_id", type=int, default=None, help="speaker id")
    p.add_argument("--no_ema", action="store_true",
                   help="use raw params instead of EMA shadow params")
    p.add_argument("--wav_seed", default=None,
                   help="wav file that primes generation (teacher-forced "
                        "warm-up, reference generate.py:66,168-192)")
    p.add_argument("--temperature", type=float, default=1.0,
                   help="softmax sampling temperature (quantized input_type "
                        "only, reference generate.py:55,216-231)")
    add_platform_arg(p)
    args = p.parse_args()
    set_platform(args.platform)
    enable_compilation_cache()  # after set_platform: gate needs the real platform

    gen = WaveNetGenerator().load(args.load_path, use_ema=not args.no_ema)

    wav_seed = None
    if args.wav_seed:
        from tacotron_wavenet_vocoder_korean_tpu import dsp
        wav_seed = dsp.load_wav(args.wav_seed, gen.cfg.audio.sample_rate)

    def out_name(mel_path, i):
        if args.out:
            if len(args.mel) == 1:
                return args.out
            # N mels with one --out: index the stem (out.wav -> out_0.wav)
            stem, ext = os.path.splitext(args.out)
            return f"{stem}_{i}{ext or '.wav'}"
        return mel_path.rsplit(".", 1)[0] + ".gen.wav"

    # vocode up to 8 streams per batched launch
    for lo in range(0, len(args.mel), 8):
        mel_paths = args.mel[lo:lo + 8]
        out_paths = [out_name(m, lo + i) for i, m in enumerate(mel_paths)]
        gen.generate_to_file(mel_paths, out_paths, speaker_id=args.gc_id,
                             wav_seed=wav_seed,
                             temperature=args.temperature)
        for m, o in zip(mel_paths, out_paths):
            print(f"{m} -> {o}")


if __name__ == "__main__":
    main()
