#!/usr/bin/env python
"""End-to-end TTS CLI: text -> Tacotron mel -> WaveNet (or Griffin-Lim) wav.

Example:
    python tts.py --tacotron logs/taco --wavenet logs/wavenet \\
        --text "안녕하세요" --out_dir samples
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tacotron_wavenet_vocoder_korean_tpu.synth import TTSPipeline


from tacotron_wavenet_vocoder_korean_tpu.utils.misc import (
    enable_compilation_cache, add_platform_arg, set_platform)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tacotron", required=True, help="tacotron run dir")
    p.add_argument("--wavenet", default=None,
                   help="wavenet run dir (omit for Griffin-Lim only)")
    p.add_argument("--text", action="append", required=True)
    p.add_argument("--out_dir", default="samples")
    p.add_argument("--speaker_id", type=int, action="append", default=None)
    p.add_argument("--fused_rnn", action="store_true",
                   help="load the checkpoint through the fused-GRU fast path")
    add_platform_arg(p)
    args = p.parse_args()
    set_platform(args.platform)
    enable_compilation_cache()  # after set_platform: gate needs the real platform

    pipe = TTSPipeline().load(args.tacotron, args.wavenet,
                              fused_rnn=args.fused_rnn)
    results = pipe.tts(args.text, base_path=args.out_dir,
                       speaker_ids=args.speaker_id)
    for r in results:
        line = f"{r['text']!r} -> GL: {r.get('wav_path')}"
        if "wavenet_wav_path" in r:
            line += f", WaveNet: {r['wavenet_wav_path']}"
        print(line)


if __name__ == "__main__":
    main()
