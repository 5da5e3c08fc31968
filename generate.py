#!/usr/bin/env python
"""WaveNet waveform generation CLI (reference: generate.py:38-264).

Example:
    python generate.py --load_path logs/wavenet --mel workdir/synth/0.mel.npy \\
        --out out.wav
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tacotron_wavenet_vocoder_korean_tpu.synth.generator import WaveNetGenerator


from tacotron_wavenet_vocoder_korean_tpu.utils.misc import (
    enable_compilation_cache)


def main():
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--load_path", required=True, help="wavenet run dir")
    p.add_argument("--mel", action="append", required=True,
                   help="mel .npy from the synthesizer (repeatable)")
    p.add_argument("--out", default=None,
                   help="output wav (default: <mel>.wav)")
    p.add_argument("--gc_id", type=int, default=None, help="speaker id")
    p.add_argument("--no_ema", action="store_true",
                   help="use raw params instead of EMA shadow params")
    args = p.parse_args()

    gen = WaveNetGenerator().load(args.load_path, use_ema=not args.no_ema)
    for i, mel_path in enumerate(args.mel):
        out = args.out if (args.out and len(args.mel) == 1) else \
            mel_path.rsplit(".", 1)[0] + ".gen.wav"
        path = gen.generate_to_file(mel_path, out, speaker_id=args.gc_id)
        print(f"{mel_path} -> {path}")


if __name__ == "__main__":
    main()
