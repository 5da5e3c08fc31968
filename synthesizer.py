#!/usr/bin/env python
"""Tacotron synthesis CLI (reference: synthesizer.py:370-388).

Example:
    python synthesizer.py --load_path logs/moon \\
        --text "존경하는 국민 여러분" --base_path samples/out
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tacotron_wavenet_vocoder_korean_tpu.synth import Synthesizer


from tacotron_wavenet_vocoder_korean_tpu.utils.misc import (
    enable_compilation_cache, add_platform_arg, set_platform)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--load_path", required=True, help="training run dir")
    p.add_argument("--text", action="append", required=True,
                   help="text to synthesize (repeatable)")
    p.add_argument("--base_path", default="samples")
    p.add_argument("--speaker_id", type=int, action="append", default=None)
    p.add_argument("--manual_attention_mode", type=int, default=0,
                   choices=[0, 1, 2, 3])
    p.add_argument("--no_attention_trim", action="store_true")
    p.add_argument("--max_iters", type=int, default=None)
    p.add_argument("--fused_rnn", action="store_true",
                   help="load the checkpoint through the fused-GRU fast path")
    add_platform_arg(p)
    args = p.parse_args()
    set_platform(args.platform)
    enable_compilation_cache()  # after set_platform: gate needs the real platform

    synth = Synthesizer().load(args.load_path, fused_rnn=args.fused_rnn)
    results = synth.synthesize(
        args.text, base_path=args.base_path, speaker_ids=args.speaker_id,
        attention_trim=not args.no_attention_trim,
        manual_attention_mode=args.manual_attention_mode,
        max_iters=args.max_iters)
    for r in results:
        print(f"{r['text']!r} -> {r.get('wav_path')} "
              f"({len(r['wav'])} samples)")


if __name__ == "__main__":
    main()
