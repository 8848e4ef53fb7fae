"""Multi-chip decomposition helpers.

The production sharded compute lives in search/wavefront.py
(`_fused_luma_sharded_builder`): row-band sharding of the fused luma
stage A with the real cost model and `ppermute` halo exchange over the
`row` mesh axis, byte-identical to the single-device path. This package
only holds mesh construction; the old SAD-cost halo demo (dist/sharded.py)
was deleted once the production path covered it (round-2 VERDICT).
"""
import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(devices=None, frame_axis=None):
    """Build a (frame, row) mesh from available devices.

    The two axes are the codec's decomposition dimensions (SURVEY.md
    §2.3): `frame` = independent all-intra frames (pure data
    parallelism), `row` = CTU-row bands within a frame (one-row halo via
    ppermute)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if frame_axis is None:
        # favour a square-ish factorization
        frame_axis = 1
        for f in range(int(np.sqrt(n)), 0, -1):
            if n % f == 0:
                frame_axis = f
                break
    rows = n // frame_axis
    dev = np.array(devices[:frame_axis * rows]).reshape(frame_axis, rows)
    return Mesh(dev, ("frame", "row"))
