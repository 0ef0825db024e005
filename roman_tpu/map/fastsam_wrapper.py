"""Alias module mirroring the reference's roman/map/fastsam_wrapper.py
import path: ``from roman_tpu.map.fastsam_wrapper import FastSAMWrapper``.

The TPU front-end batches frames (reference FastSAMWrapper.run is
one-frame-at-a-time torch, fastsam_wrapper.py:254-418); the
reference-shaped surface is provided here: `FastSAMWrapper.from_params`
builds a PerceptionFrontend and `.run(t, pose, img, depth)` adapts the
single-frame call onto `run_batch`.
"""

from __future__ import annotations

import numpy as np

from roman_tpu.perception.wrapper import PerceptionFrontend


class FastSAMWrapper(PerceptionFrontend):
    """PerceptionFrontend with the reference's single-frame surface."""

    @classmethod
    def from_params(cls, params, camera, **kw):
        """Reference factory (fastsam_wrapper.py:98-134)."""
        return cls(params, camera, **kw)

    def run(self, t, pose, img, depth):
        """Single-frame adapter: returns the frame's observations as
        (points, valid, descriptors, mask) arrays from run_batch. For
        throughput use run_batch directly — one dispatch per batch."""
        out = self.run_batch(np.asarray(img)[None], np.asarray(depth)[None])
        return out
