#!/usr/bin/env python
"""End-to-end quality evaluation: MCD of synthesized speech vs real speech.

For each sampled corpus utterance:
  * oracle  — Griffin-Lim on the REAL linear spectrogram vs the real audio
              (the vocoder bound: no acoustic model involved)
  * synth   — full text -> Tacotron -> Griffin-Lim pipeline vs the real audio

The gap synth - oracle isolates the acoustic model's contribution; at
convergence it approaches 0.  Prints one JSON line, with a per-speaker
breakdown when several data dirs are given (speaker id = position in the
--data list, matching the training feeder's dir_to_id).

Usage:
  python scripts/quality_eval.py --tacotron logs/moon_r1 \
      --data workdir/moon/data [--n 6] [--platform cpu]
  # multi-speaker, held-out utterances only:
  python scripts/quality_eval.py --tacotron logs/both \
      --data workdir/moon/data,workdir/son/data --heldout
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
    p.add_argument("--data", type=lambda s: s.split(","), required=True,
                   help="preprocessed npz dir(s), comma separated; order "
                        "must match training so speaker ids line up")
    p.add_argument("--n", type=int, default=6,
                   help="utterances to score per speaker")
    p.add_argument("--heldout", action="store_true",
                   help="score ONLY the run's held-out split (reconstructed "
                        "with the run config's seed + num_test_per_speaker; "
                        "--data must list ALL training dirs in train order)")
    p.add_argument("--skip_path_filter", action="store_true",
                   help="must match the flag the training run used, or the "
                        "reconstructed held-out split will differ")
    p.add_argument("--out_dir", default=None,
                   help="optionally save synthesized wavs here")
    p.add_argument("--wavenet", default=None,
                   help="wavenet run dir: additionally score the TRUE "
                        "end-to-end path (text -> Tacotron mel -> WaveNet "
                        "wav) as e2e_mcd_db (reference synthesizer.py:276-280"
                        " -> generate.py:106-264 workflow)")
    p.add_argument("--e2e_max_frames", type=int, default=None,
                   help="smoke-only: cap mel frames fed to the vocoder "
                        "(truncates the e2e comparison; never set in a "
                        "scored run)")
    p.add_argument("--no_persist", action="store_true",
                   help="smoke mode: print JSON but do not write "
                        "eval.json/eval_history.jsonl into the run dir")
    from tacotron_wavenet_vocoder_korean_tpu.utils.misc import (
        add_platform_arg)
    add_platform_arg(p)
    p.add_argument("--fused_rnn", action="store_true",
                   help="use the fused-GRU fast inference path")
    p.add_argument("--inference_dropout", choices=("auto", "on", "off"),
                   default="auto",
                   help="decoder-prenet dropout at inference: 'auto' follows "
                        "the run config (reference keeps it ON, "
                        "tacotron.py:41); 'on'/'off' force it for A/B runs")
    args = p.parse_args()
    from tacotron_wavenet_vocoder_korean_tpu.utils.misc import set_platform
    set_platform(args.platform)

    import numpy as np
    from tacotron_wavenet_vocoder_korean_tpu.utils.misc import (
        enable_compilation_cache)
    from tacotron_wavenet_vocoder_korean_tpu.utils.metrics import mcd
    from tacotron_wavenet_vocoder_korean_tpu.synth import Synthesizer
    from tacotron_wavenet_vocoder_korean_tpu import dsp

    enable_compilation_cache()
    inference_dropout = {"auto": None, "on": True, "off": False}[
        args.inference_dropout]
    synth = Synthesizer().load(args.tacotron, fused_rnn=args.fused_rnn,
                               inference_dropout=inference_dropout)
    cfg = synth.cfg
    vocoder = None
    if args.wavenet:
        from tacotron_wavenet_vocoder_korean_tpu.synth import WaveNetGenerator
        vocoder = WaveNetGenerator().load(args.wavenet)

    heldout_batcher = None
    if args.heldout:
        # Reconstruct the training held-out split.  The training batcher
        # shuffles every dir's paths from ONE RandomState in --data order,
        # so the split is only reproducible by building a single batcher
        # over ALL dirs in that same order (a per-dir batcher would reseed
        # and hold out a different subset for every dir after the first).
        from tacotron_wavenet_vocoder_korean_tpu.data.loader import (
            TacotronBatcher)
        # apply_filter=None derives from the run config
        # (train.skip_path_filter), so the reconstructed split matches
        # training without the caller re-passing the flag
        heldout_batcher = TacotronBatcher(
            args.data, cfg, "test", batch_size=1,
            apply_filter=False if args.skip_path_filter else None)

    def pick_paths(data_dir):
        if heldout_batcher is not None:
            paths = sorted(heldout_batcher.path_dict[data_dir])
        else:
            paths = sorted(glob.glob(os.path.join(data_dir, "*.npz")))
        # deterministic spread
        return paths[:: max(1, len(paths) // args.n)][:args.n]

    per_speaker = {}
    all_synth, all_oracle = [], []
    e2e_jobs = []
    for sid, data_dir in enumerate(args.data):
        oracle_scores, synth_scores = [], []
        for path in pick_paths(data_dir):
            with np.load(path) as d:
                real = np.asarray(d["audio"], np.float32)
                linear = np.asarray(d["linear"], np.float32)
                text = str(d["text"])

            gl_oracle = np.asarray(
                dsp.inv_linear_spectrogram(linear.T, cfg.audio))
            oracle_scores.append(mcd(gl_oracle, real, cfg.audio))

            out = synth.synthesize([text], speaker_ids=[sid],
                                   save_alignment=False, save_mel=False)
            wav = out[0]["wav"]
            synth_scores.append(mcd(wav, real, cfg.audio))
            if vocoder is not None:
                e2e_jobs.append(
                    {"sid": sid, "real": real, "mel": out[0]["mel"],
                     "base": os.path.splitext(os.path.basename(path))[0]})
            if args.out_dir:
                os.makedirs(args.out_dir, exist_ok=True)
                base = os.path.splitext(os.path.basename(path))[0]
                dsp.save_wav(
                    wav, os.path.join(args.out_dir, f"{sid}_{base}.synth.wav"),
                    cfg.audio.sample_rate)

        name = (os.path.basename(os.path.dirname(os.path.normpath(data_dir)))
                or data_dir)
        # prefix with speaker id: two dirs with the same parent name must
        # not overwrite each other's breakdown
        per_speaker[f"{sid}:{name}"] = {
            "n": len(synth_scores),
            "synth_mcd_db": round(float(np.mean(synth_scores)), 2),
            "oracle_mcd_db": round(float(np.mean(oracle_scores)), 2),
            "gap_db": round(float(np.mean(synth_scores) -
                                  np.mean(oracle_scores)), 2),
            "per_utt_synth": [round(s, 2) for s in synth_scores],
            "per_utt_oracle": [round(s, 2) for s in oracle_scores],
        }
        all_synth += synth_scores
        all_oracle += oracle_scores

    e2e_field = {}
    if vocoder is not None and e2e_jobs:
        # Pad every free-run mel to ONE shared frame count so the WaveNet
        # generation kernel compiles exactly once (per-shape compiles over
        # the tunnel take minutes — same trick as scripts/vocoder_eval.py);
        # the padded tail is silence, trimmed from the wav below.
        hop = cfg.audio.hop_size
        pad_val = (-cfg.audio.max_abs_value if cfg.audio.symmetric_mels
                   else 0.0)
        if args.e2e_max_frames:
            for j in e2e_jobs:
                j["mel"] = j["mel"][:args.e2e_max_frames]
                j["real"] = j["real"][:args.e2e_max_frames
                                      * cfg.audio.hop_size]
        f_max = max(len(j["mel"]) for j in e2e_jobs)
        per_sid_scores = {}
        for j in e2e_jobs:
            n_frames = len(j["mel"])
            mel_pad = np.pad(j["mel"], ((0, f_max - n_frames), (0, 0)),
                             constant_values=pad_val)
            wav = vocoder.generate(mel_pad)[:n_frames * hop]
            score = mcd(wav, j["real"], cfg.audio)
            per_sid_scores.setdefault(j["sid"], []).append(round(score, 2))
            if args.out_dir:
                dsp.save_wav(
                    wav,
                    os.path.join(args.out_dir,
                                 f"{j['sid']}_{j['base']}.e2e.wav"),
                    cfg.audio.sample_rate)
        all_e2e = [s for scores in per_sid_scores.values() for s in scores]
        for key in per_speaker:
            sid = int(key.split(":", 1)[0])
            if sid in per_sid_scores:
                scores = per_sid_scores[sid]
                per_speaker[key]["e2e_mcd_db"] = round(
                    float(np.mean(scores)), 2)
                per_speaker[key]["per_utt_e2e"] = scores
        e2e_field = {
            "e2e_mcd_db": round(float(np.mean(all_e2e)), 2),
            "e2e_vocoder": args.wavenet,
            "e2e_vocoder_step": vocoder.step,
        }

    result = {
        "metric": "mcd_db",
        "n_utterances": len(all_synth),
        **e2e_field,
        "heldout_only": bool(args.heldout),
        "inference_dropout": args.inference_dropout,
        "synth_mcd_db": round(float(np.mean(all_synth)), 2),
        "oracle_mcd_db": round(float(np.mean(all_oracle)), 2),
        "gap_db": round(float(np.mean(all_synth) - np.mean(all_oracle)), 2),
        "checkpoint_step": synth.step,
        "per_speaker": per_speaker,
    }
    print(json.dumps(result))
    if args.no_persist:
        return
    # Persist beside the checkpoint it measures: snapshot_ckpt.sh bundles
    # <run>/eval.json into artifacts/ so quality evidence survives VM resets.
    with open(os.path.join(args.tacotron, "eval.json"), "w") as f:
        json.dump(result, f, indent=1)
    # Append-only trend file (rides along in snapshots): keeps the
    # MCD-vs-step history auditable instead of overwriting each eval.
    with open(os.path.join(args.tacotron, "eval_history.jsonl"), "a") as f:
        f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
