#!/usr/bin/env python
"""End-to-end quality evaluation: MCD of synthesized speech vs real speech.

For each sampled corpus utterance:
  * oracle  — Griffin-Lim on the REAL linear spectrogram vs the real audio
              (the vocoder bound: no acoustic model involved)
  * synth   — full text -> Tacotron -> Griffin-Lim pipeline vs the real audio

The gap synth - oracle isolates the acoustic model's contribution; at
convergence it approaches 0.  Prints one JSON line.

Usage:
  python scripts/quality_eval.py --tacotron logs/moon_r1 \
      --data workdir/moon/data [--n 6] [--platform cpu]
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tacotron", required=True, help="tacotron run dir")
    p.add_argument("--data", required=True, help="preprocessed npz dir")
    p.add_argument("--n", type=int, default=6, help="utterances to score")
    p.add_argument("--out_dir", default=None,
                   help="optionally save synthesized wavs here")
    p.add_argument("--platform", default=None)
    p.add_argument("--fused_rnn", action="store_true",
                   help="use the fused-GRU fast inference path")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    from tacotron_wavenet_vocoder_korean_tpu.utils.misc import (
        enable_compilation_cache)
    from tacotron_wavenet_vocoder_korean_tpu.utils.metrics import mcd
    from tacotron_wavenet_vocoder_korean_tpu.synth import Synthesizer
    from tacotron_wavenet_vocoder_korean_tpu import dsp

    enable_compilation_cache()
    synth = Synthesizer().load(args.tacotron, fused_rnn=args.fused_rnn)
    cfg = synth.cfg

    paths = sorted(glob.glob(os.path.join(args.data, "*.npz")))
    # deterministic spread over the corpus
    paths = paths[:: max(1, len(paths) // args.n)][:args.n]

    oracle_scores, synth_scores, texts = [], [], []
    for path in paths:
        with np.load(path) as d:
            real = np.asarray(d["audio"], np.float32)
            linear = np.asarray(d["linear"], np.float32)
            text = str(d["text"])
        texts.append(text)

        gl_oracle = np.asarray(dsp.inv_linear_spectrogram(linear.T, cfg.audio))
        oracle_scores.append(mcd(gl_oracle, real, cfg.audio))

        out = synth.synthesize([text], save_alignment=False, save_mel=False)
        wav = out[0]["wav"]
        synth_scores.append(mcd(wav, real, cfg.audio))
        if args.out_dir:
            os.makedirs(args.out_dir, exist_ok=True)
            base = os.path.splitext(os.path.basename(path))[0]
            dsp.save_wav(wav, os.path.join(args.out_dir, base + ".synth.wav"),
                         cfg.audio.sample_rate)

    result = {
        "metric": "mcd_db",
        "n_utterances": len(paths),
        "synth_mcd_db": round(float(np.mean(synth_scores)), 2),
        "oracle_mcd_db": round(float(np.mean(oracle_scores)), 2),
        "gap_db": round(float(np.mean(synth_scores) -
                              np.mean(oracle_scores)), 2),
        "checkpoint_step": synth.step,
        "per_utt_synth": [round(s, 2) for s in synth_scores],
        "per_utt_oracle": [round(s, 2) for s in oracle_scores],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
