#!/usr/bin/env python
"""Corpus preprocessing CLI (reference: preprocess.py:38-61).

Example:
    python preprocess.py --name moon --in_dir ./datasets/moon \\
        --out_dir ./datasets/moon/data --num_workers 4
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Preprocessing is host-side work; pin jax to CPU so the TPU stays free for
# training and the axon tunnel is never initialized from worker threads.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from tacotron_wavenet_vocoder_korean_tpu.config import Config, save_config
from tacotron_wavenet_vocoder_korean_tpu.data import preprocess_corpus


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", required=True,
                        help="corpus name: moon | son | ljspeech | cmu_arctic")
    parser.add_argument("--in_dir", required=True)
    parser.add_argument("--out_dir", default=None)
    parser.add_argument("--num_workers", type=int, default=1)
    args = parser.parse_args()

    out_dir = args.out_dir or os.path.join(args.in_dir, "data")
    cfg = Config()
    os.makedirs(out_dir, exist_ok=True)
    save_config(cfg, out_dir)
    preprocess_corpus(cfg, args.name, args.in_dir, out_dir, args.num_workers)


if __name__ == "__main__":
    main()
