#!/usr/bin/env python
"""WaveNet vocoder quality evaluation: MCD of vocoded speech vs real speech.

For sampled corpus utterances, vocode the GROUND-TRUTH mel with the trained
WaveNet (EMA params, on-device generation) and score DTW-MCD against the
real audio; the Griffin-Lim-on-real-linear oracle is reported for context
(reference's baseline vocoder).  Prints one JSON line.

Usage:
  python scripts/vocoder_eval.py --wavenet logs/wn_moon \
      --data workdir/moon/data [--n 3] [--out_dir DIR]
"""
import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def select_eval_paths(all_paths, n, n_test):
    """Pick eval utterances: every truly held-out clip (the loader's split,
    data/loader.py:452-456 — last n_test of the sorted paths when the corpus
    is big enough), then an even spread over the rest up to ``n`` total.
    Returns (paths, heldout_set)."""
    held = set(all_paths[-n_test:]) if len(all_paths) >= 2 * n_test else set()
    rest = [p_ for p_ in all_paths if p_ not in held]
    budget = max(0, n - len(held))
    rest = rest[:: max(1, len(rest) // budget)][:budget] if budget else []
    return sorted(held) + rest, held


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wavenet", required=True, help="wavenet run dir")
    p.add_argument("--data", required=True, help="preprocessed npz dir")
    p.add_argument("--n", type=int, default=10)
    p.add_argument("--unseen_data", type=lambda s: s.split(","), default=None,
                   help="extra npz dir(s) the vocoder NEVER trained on (e.g. "
                        "a different speaker's corpus): clips from here are "
                        "scored identically and counted as heldout — an "
                        "honest way to widen the never-trained sample when "
                        "the run's own split held out few clips (the model "
                        "is mel-conditioned only, so cross-speaker vocoding "
                        "is well-defined)")
    p.add_argument("--n_unseen", type=int, default=8,
                   help="clips to score per --unseen_data dir")
    p.add_argument("--max_frames", type=int, default=240,
                   help="cap mel length per utterance (3 s default)")
    p.add_argument("--out_dir", default=None)
    p.add_argument("--no_persist", action="store_true",
                   help="smoke mode: print JSON but do not write "
                        "eval.json/eval_history.jsonl into the run dir")
    from tacotron_wavenet_vocoder_korean_tpu.utils.misc import (
        add_platform_arg, set_platform)
    add_platform_arg(p)
    args = p.parse_args()
    set_platform(args.platform)

    import numpy as np
    from tacotron_wavenet_vocoder_korean_tpu.utils.misc import (
        enable_compilation_cache)
    from tacotron_wavenet_vocoder_korean_tpu.utils.metrics import mcd
    from tacotron_wavenet_vocoder_korean_tpu.synth import WaveNetGenerator
    from tacotron_wavenet_vocoder_korean_tpu import dsp

    enable_compilation_cache()
    gen = WaveNetGenerator().load(args.wavenet)
    cfg = gen.cfg
    hop = cfg.audio.hop_size

    all_paths = sorted(glob.glob(os.path.join(args.data, "*.npz")))
    # Always evaluate every truly held-out clip, then spread the remaining
    # budget evenly over the corpus for statistical weight (the vocoder
    # consumes ground-truth acoustics, so train-clip copy-synthesis is a
    # meaningful secondary sample; the heldout subset is reported separately).
    paths, held = select_eval_paths(
        all_paths, args.n, max(1, cfg.train.num_test_per_speaker))
    # Never-trained clips from OTHER corpora (unseen speaker): full heldout
    # status — the training data_dir never contained them.
    unseen = set()
    for d in (args.unseen_data or []):
        dpaths = sorted(glob.glob(os.path.join(d, "*.npz")))
        pick = dpaths[:: max(1, len(dpaths) // args.n_unseen)][:args.n_unseen]
        unseen.update(pick)
        paths = paths + pick
    held = held | unseen

    pad_val = (-cfg.audio.max_abs_value if cfg.audio.symmetric_mels else 0.0)
    wn_scores, gl_scores, rtfs = [], [], []
    for path in paths:
        with np.load(path) as d:
            real = np.asarray(d["audio"], np.float32)
            mel = np.asarray(d["mel"], np.float32)
            linear = np.asarray(d["linear"], np.float32)
        n_frames = min(len(mel), args.max_frames)
        mel, linear = mel[:n_frames], linear[:, :][:n_frames]
        real_cut = real[:n_frames * hop]

        # pad every mel to the SAME length so the generation kernel
        # compiles once (per-shape compiles over the tunnel take minutes);
        # the padded tail is silence, cut from the waveform below
        mel_pad = np.pad(mel, ((0, args.max_frames - n_frames), (0, 0)),
                         constant_values=pad_val)
        t0 = time.time()
        wav = gen.generate(mel_pad)[:n_frames * hop]
        dt = time.time() - t0
        rtfs.append(len(wav) / dt / cfg.audio.sample_rate)
        wn_scores.append(mcd(wav, real_cut, cfg.audio))
        # pad the linear spectrogram to the SAME fixed length too: the
        # on-device Griffin-Lim compiles per shape, and n distinct
        # utterance lengths would cost n multi-minute tunnel compiles
        lin_pad = np.pad(linear, ((0, args.max_frames - n_frames), (0, 0)),
                         constant_values=linear.min())
        gl = np.asarray(dsp.inv_linear_spectrogram(
            lin_pad.T, cfg.audio))[:n_frames * hop]
        gl_scores.append(mcd(gl, real_cut, cfg.audio))
        if args.out_dir:
            os.makedirs(args.out_dir, exist_ok=True)
            base = os.path.splitext(os.path.basename(path))[0]
            dsp.save_wav(wav, os.path.join(args.out_dir, base + ".wn.wav"),
                         cfg.audio.sample_rate)

    held_idx = [i for i, p_ in enumerate(paths) if p_ in held]
    same_idx = [i for i in held_idx if paths[i] not in unseen]
    unseen_idx = [i for i in held_idx if paths[i] in unseen]
    result = {
        "metric": "vocoder_mcd_db",
        "n_utterances": len(paths),
        "wavenet_mcd_db": round(float(np.mean(wn_scores)), 2),
        "gl_oracle_mcd_db": round(float(np.mean(gl_scores)), 2),
        # never-trained-on clips only: the loader's heldout split plus any
        # --unseen_data clips (other corpora the run never saw)
        "heldout_wavenet_mcd_db": (
            round(float(np.mean([wn_scores[i] for i in held_idx])), 2)
            if held_idx else None),
        "n_heldout": len(held_idx),
        "heldout_same_speaker_mcd_db": (
            round(float(np.mean([wn_scores[i] for i in same_idx])), 2)
            if same_idx else None),
        "unseen_speaker_mcd_db": (
            round(float(np.mean([wn_scores[i] for i in unseen_idx])), 2)
            if unseen_idx else None),
        "unseen_speaker_gl_oracle_mcd_db": (
            round(float(np.mean([gl_scores[i] for i in unseen_idx])), 2)
            if unseen_idx else None),
        "checkpoint_step": gen.step,
        # median: the first call pays the (cached-thereafter) compile
        "gen_realtime_factor": round(float(np.median(rtfs)), 2),
        "per_utt": [
            {"utt": os.path.splitext(os.path.basename(p_))[0],
             "heldout": p_ in held,
             **({"unseen_speaker": True} if p_ in unseen else {}),
             "wavenet_mcd_db": round(wn_scores[i], 2),
             "gl_mcd_db": round(gl_scores[i], 2)}
            for i, p_ in enumerate(paths)],
    }
    print(json.dumps(result))
    if args.no_persist:
        return
    # Persist beside the checkpoint it measures: snapshot_ckpt.sh bundles
    # <run>/eval.json into artifacts/ so quality evidence survives VM resets.
    with open(os.path.join(args.wavenet, "eval.json"), "w") as f:
        json.dump(result, f, indent=1)
    # Append-only trend file (rides along in snapshots): the MCD-vs-step
    # curve is the acceptance evidence for the vocoder campaign, so each
    # eval run extends the auditable history instead of overwriting it.
    with open(os.path.join(args.wavenet, "eval_history.jsonl"), "a") as f:
        f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
