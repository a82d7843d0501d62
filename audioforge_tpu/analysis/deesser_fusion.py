"""Frozen soft-fusion model for de-esser setup evidence.

Mirrors `python/mic_eq/analysis/deesser_fusion.py:7-57`: a versioned,
interpretable logistic-regression pair (frame level + clip level) over
bounded [0, 1] features, with the committed intercepts/coefficients and the
conservative enable threshold 0.4935 (tuned so a missed mild case is safer
than dulling a merely-bright microphone). The coefficients are regenerated
by the evaluation tooling; they are frozen model DATA, reproduced exactly.
"""

from __future__ import annotations

import numpy as np

MODEL_VERSION = "deesser-soft-fusion-v1"
CORPUS_VERSION = "audioforge-generated-deesser-corpus-v1"

FRAME_FEATURE_NAMES = (
    "absolute_hf_strength",
    "temporal_hf_excess",
    "noise_reliability",
    "unvoiced_evidence",
    "peak_prominence",
    "peak_location",
)
CLIP_FEATURE_NAMES = (
    "frame_probability_p90",
    "frame_probability_top_mean",
    "candidate_support",
    "temporal_contrast",
    "absolute_hf_strength_p90",
    "noise_reliability_p90",
)

FRAME_INTERCEPT = -14.745480728063148
FRAME_COEFFICIENTS = np.asarray(
    [
        1.4074734365324453,
        5.220098953258285,
        2.427808017651834,
        1.1022350583682425,
        4.160012489488813,
        2.4617269295476714,
    ]
)
CLIP_INTERCEPT = -5.98947017317317
CLIP_COEFFICIENTS = np.asarray(
    [
        2.9145233318588595,
        2.038737680696125,
        0.5664410938494544,
        0.8808711007448764,
        3.440954995939097,
        0.8326905545571951,
    ]
)

ENABLE_PROBABILITY_THRESHOLD = 0.4935253581578833

__all__ = [
    "CLIP_COEFFICIENTS",
    "CLIP_FEATURE_NAMES",
    "CLIP_INTERCEPT",
    "CORPUS_VERSION",
    "ENABLE_PROBABILITY_THRESHOLD",
    "FRAME_COEFFICIENTS",
    "FRAME_FEATURE_NAMES",
    "FRAME_INTERCEPT",
    "MODEL_VERSION",
    "predict_clip_probability",
    "predict_frame_probabilities",
]


def _stable_sigmoid(logit):
    v = np.asarray(logit, float)
    out = np.empty_like(v)
    pos = v >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-v[pos]))
    e = np.exp(v[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def predict_frame_probabilities(feature_rows):
    """Calibrated per-frame probability that a frame is sibilant."""
    f = np.asarray(feature_rows, float)
    if f.ndim != 2 or f.shape[1] != len(FRAME_FEATURE_NAMES):
        raise ValueError(
            f"expected frame features with shape (n, {len(FRAME_FEATURE_NAMES)})"
        )
    return _stable_sigmoid(FRAME_INTERCEPT + np.clip(f, 0, 1) @ FRAME_COEFFICIENTS)


def predict_clip_probability(features):
    """Clip-level probability that de-essing is warranted."""
    v = np.asarray(features, float).reshape(-1)
    if v.size != len(CLIP_FEATURE_NAMES):
        raise ValueError(f"expected {len(CLIP_FEATURE_NAMES)} clip features")
    return float(_stable_sigmoid(CLIP_INTERCEPT + np.dot(np.clip(v, 0, 1), CLIP_COEFFICIENTS)))
