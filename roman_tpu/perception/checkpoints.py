"""Model parameter checkpointing via orbax.

The reference loads torch .pt weights from disk on every run
(fastsam_wrapper.py:90-188, install.sh downloads). Here converted flax
params are saved/restored with orbax so the (torch -> flax) conversion
runs once; subsequent sessions restore directly on device.
"""

from __future__ import annotations

import os
from typing import Any


def save_params(params: Any, path: str):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.expanduser(path))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, like: Any = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.expanduser(path))
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, target=like)
    return ckptr.restore(path)


def load_or_convert(ckpt_path: str, torch_path: str, convert_fn, like: Any = None):
    """Restore an orbax checkpoint if present; otherwise convert the torch
    weights and save the result for next time."""
    if os.path.exists(os.path.expanduser(ckpt_path)):
        return load_params(ckpt_path, like)
    params = convert_fn(torch_path)
    save_params(params, ckpt_path)
    return params
