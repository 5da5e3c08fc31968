"""Attention-alignment heatmap PNGs with Korean jamo tick labels
(reference: utils/plot.py:25-77)."""
from __future__ import annotations

import os
from typing import Optional, Sequence

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib import font_manager  # noqa: E402

# A CJK-capable font is needed for jamo tick labels; use the reference's
# bundled font read-only if present, else fall back to the matplotlib default
# (labels will render as boxes but the heatmap is still useful).
_FONT_CANDIDATES = [
    "/root/reference/utils/NanumBarunGothic.ttf",
    "/usr/share/fonts/truetype/nanum/NanumBarunGothic.ttf",
]
_font_prop = None
for _path in _FONT_CANDIDATES:
    if os.path.exists(_path):
        _font_prop = font_manager.FontProperties(fname=_path)
        break


def plot_alignment(alignment, path: str, info: Optional[str] = None,
                   text: Optional[Sequence[str]] = None,
                   is_korean: bool = True) -> None:
    """``alignment``: [encoder_steps(T_in), decoder_steps].  PAD/EOS-aware
    truncation happens in the caller (pass pre-trimmed text/alignment)."""
    if text:
        alignment = alignment[:len(text)]

    fig, ax = plt.subplots(figsize=(12, 8))
    im = ax.imshow(alignment, aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)

    xlabel = "Decoder timestep"
    if info is not None:
        xlabel += "\n\n" + info
    ax.set_xlabel(xlabel)
    ax.set_ylabel("Encoder timestep")

    if text:
        ax.set_yticks(range(len(text)))
        if _font_prop is not None:
            ax.set_yticklabels(text, fontproperties=_font_prop, fontsize=8)
        else:
            ax.set_yticklabels(text, fontsize=8)

    plt.tight_layout()
    plt.savefig(path, format="png", dpi=120)
    plt.close(fig)


def plot_spectrogram(spec, path: str, title: Optional[str] = None) -> None:
    """[frames, bins] spectrogram heatmap."""
    fig, ax = plt.subplots(figsize=(12, 4))
    im = ax.imshow(spec.T, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    if title:
        ax.set_title(title)
    ax.set_xlabel("Frames")
    ax.set_ylabel("Bins")
    plt.tight_layout()
    plt.savefig(path, format="png", dpi=120)
    plt.close(fig)
