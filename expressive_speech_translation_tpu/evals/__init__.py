"""Evaluation metric battery (working rebuild of the reference's WIP template)."""

from .acoustic_metrics import (
    av_sync_correlation,
    f0_statistics,
    harmonics_to_noise_ratio,
    rms_intensity,
    speaker_similarity,
    track_f0,
)
from .analyze import analyze_outputs, analyze_single_job
from .text_metrics import chrf, corpus_bleu, sentence_bleu, token_f1

__all__ = [
    "analyze_outputs",
    "analyze_single_job",
    "av_sync_correlation",
    "chrf",
    "corpus_bleu",
    "f0_statistics",
    "harmonics_to_noise_ratio",
    "rms_intensity",
    "sentence_bleu",
    "speaker_similarity",
    "token_f1",
    "track_f0",
]
