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

    def run(self, t, pose, img, depth_data=None):
        """Single-frame adapter with the reference's return contract
        (fastsam_wrapper.py:254-265): (list of Observations,
        frame_descriptor or None). For throughput use run_batch directly —
        one dispatch per batch."""
        img = np.asarray(img)
        depth = (np.asarray(depth_data) if depth_data is not None
                 else np.zeros(img.shape[:2], np.float32))
        out = self.run_batch(img[None], depth[None])
        obs = self.observations(out, [t], [np.asarray(pose)])[0]
        fdesc = (np.asarray(out.frame_descriptors[0])
                 if out.frame_descriptors is not None
                 and np.size(out.frame_descriptors) else None)
        return obs, fdesc
