"""Data-loading params — schema parity with reference
roman/params/data_params.py, minus ROS-bag ingestion (no ROS in this
environment). Supported input types: image directories / npz archives for
RGB-D, csv for poses; the run-env indirection (one yaml serving N robots,
reference demo/README.md:151-169) and recursive env expansion / per-run
dict override merge (data_params.py:177-194) are preserved."""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np
import yaml

from roman_tpu.data.camera import CameraParams
from roman_tpu.data.pose_data import PoseData
from roman_tpu.utils import combinedicts_recursive, expandvars_recursive

# FLU <-> RDF camera/body frame conventions (robotdatapy T_FLURDF/T_RDFFLU)
T_FLURDF = np.array(
    [[0.0, 0.0, 1.0, 0.0], [-1.0, 0.0, 0.0, 0.0], [0.0, -1.0, 0.0, 0.0], [0, 0, 0, 1]]
)
T_RDFFLU = np.linalg.inv(T_FLURDF)


def find_transformation(param_dict: dict) -> np.ndarray:
    """Transform spec resolution (data_params.py:25-62): 'string' or
    'matrix' input types ('tf' needs ROS bags, unsupported here)."""
    kind = param_dict["input_type"]
    if kind == "string":
        if param_dict["string"] == "T_FLURDF":
            return T_FLURDF
        if param_dict["string"] == "T_RDFFLU":
            return T_RDFFLU
        raise ValueError("Invalid string.")
    if kind == "matrix":
        return np.array(param_dict["matrix"]).reshape(4, 4)
    raise ValueError(f"unsupported transformation input_type {kind!r}")


@dataclasses.dataclass
class DataParams:
    runs: List[str] = dataclasses.field(default_factory=lambda: ["run0"])
    run_env: Optional[str] = None
    time_params: Optional[dict] = None
    img_data_params: Optional[dict] = None
    depth_data_params: Optional[dict] = None
    pose_data_params: Optional[dict] = None
    dt: float = 1.0 / 6.0

    @classmethod
    def from_yaml(cls, yaml_path: str, run: Optional[str] = None) -> "DataParams":
        with open(os.path.expanduser(yaml_path)) as f:
            data = yaml.safe_load(f)
        base = {k: v for k, v in data.items() if k not in data.get("runs", [])}
        if run is not None and isinstance(data.get(run), dict):
            base = combinedicts_recursive(base, data[run])
        base.pop(run, None)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in base.items() if k in known})

    def set_run_env(self, run: str):
        if self.run_env is not None:
            os.environ[self.run_env] = run

    def load_pose_data(self) -> PoseData:
        p = dict(self.pose_data_params or {})
        path = expandvars_recursive(p.pop("path"))
        kind = p.pop("type", "csv")
        if kind == "bag":
            return PoseData.from_bag(path, p["topic"],
                                     **{k: v for k, v in p.items()
                                        if k in ("interp", "time_tol", "t0_shift")})
        return PoseData.from_csv(path, **{k: v for k, v in p.items()
                                          if k in ("time_col", "delimiter", "skiprows")})

    def load_camera_params(self) -> CameraParams:
        p = self.img_data_params or {}
        if p.get("type") == "bag" and "camera_info_topic" in p:
            return CameraParams.from_bag(expandvars_recursive(p["path"]),
                                         p["camera_info_topic"])
        if "K" in p:
            K = np.array(p["K"]).reshape(3, 3)
            return CameraParams(K=K, width=p.get("width", 640), height=p.get("height", 480))
        return CameraParams.simple(p.get("width", 640), p.get("height", 480))
