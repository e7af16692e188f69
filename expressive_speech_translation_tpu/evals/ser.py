"""Speech-emotion classification — acoustic-feature stand-in.

The reference classifies emotion with a pre-trained HF audio pipeline
(Evaluation/analyze_outputs.py:125-138, ``superb/wav2vec2``-style SER) — no
such checkpoint exists in this environment, so this module implements the
classic dimensional-SER recipe instead: map prosodic features to the
arousal/valence quadrants (high F0 + high energy → angry/happy split by F0
variability; low F0 + low energy → sad; mid → neutral). It is a documented
proxy with the same API/label set, good for *relative* comparisons between a
system's outputs (the MCF-vs-Seamless study's use) rather than absolute SER
accuracy.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .acoustic_metrics import f0_statistics, rms_intensity

LABELS = ("neutral", "happy", "sad", "angry")


def emotion_features(audio: np.ndarray, sr: int = 16_000) -> Dict[str, float]:
    """Arousal/valence coordinates from prosody (each roughly in [0, 1])."""
    audio = np.asarray(audio, np.float32).reshape(-1)
    f0 = f0_statistics(audio, sr)
    # arousal: energy + pitch height; valence: pitch variability (melodic
    # speech reads positive, monotone high-energy reads negative)
    f0_mean = float(np.nan_to_num(f0.get("f0_mean", 0.0)))
    f0_std = float(np.nan_to_num(f0.get("f0_std", 0.0)))
    energy = float(np.sqrt(np.mean(audio**2))) if audio.size else 0.0
    arousal = float(np.clip(0.5 * np.tanh((energy - 0.05) * 15.0) + 0.5
                            * np.tanh((f0_mean - 160.0) / 80.0), -1, 1)) * 0.5 + 0.5
    valence = float(np.tanh((f0_std - 15.0) / 25.0)) * 0.5 + 0.5
    return {"arousal": arousal, "valence": valence,
            "f0_mean": f0_mean, "f0_std": f0_std, "energy": energy}


def classify_audio_emotion(audio: np.ndarray, sr: int = 16_000) -> str:
    """Quadrant label (analyze_outputs.py get_audio_emotion stand-in)."""
    feats = emotion_features(audio, sr)
    if feats["energy"] < 1e-4:
        return "no_prediction"
    high_arousal = feats["arousal"] > 0.55
    positive = feats["valence"] > 0.5
    if high_arousal:
        return "happy" if positive else "angry"
    return "neutral" if positive or feats["arousal"] > 0.35 else "sad"
