"""Mapping stage driver: per-run mapping with optional time chunking and
map concatenation. Parity with reference demo/mapping.py:61-244 (run(),
mapping(), <run>.time.txt output); data ingestion supports synthetic
worlds ('type: sim' in data.yaml) and RGB-D archives in this environment
(no ROS bags)."""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from roman_tpu.data.camera import CameraParams
from roman_tpu.data.pose_data import PoseData
from roman_tpu.map.observation import Observation
from roman_tpu.map.roman_map import RomanMap
from roman_tpu.map.run import MapRunner
from roman_tpu.params.data_params import DataParams
from roman_tpu.params.fastsam_params import FastSAMParams
from roman_tpu.params.mapper_params import MapperParams


@dataclasses.dataclass
class VisualizationParams:
    viz_map: bool = False
    viz_observations: bool = False
    viz_3d: bool = False
    vid_rate: float = 1.0
    save_img_data: bool = False


def _sim_observation_source(data_params: DataParams, run_name: str, rng):
    """Synthetic observation stream for 'type: sim' data: generates a
    world once (shared across runs via the seed) and replays each robot's
    observations into the mapper."""
    from roman_tpu.sim import world as sim_world

    spec = data_params.img_data_params or {}
    seed = int(spec.get("seed", 0))
    n_robots = int(spec.get("n_robots", len(data_params.runs)))
    rng = np.random.default_rng(seed)
    _, runs = sim_world.make_multi_robot_world(
        rng,
        n_robots=n_robots,
        n_objects=int(spec.get("n_objects", 600)),
        area=tuple(spec.get("area", (100.0, 100.0, 4.0))),
        traj_len=float(spec.get("traj_len", 150.0)),
        desc_dim=int(spec.get("desc_dim", 64)),
    )
    ridx = data_params.runs.index(run_name)
    robot = runs[ridx]
    obs_rng = np.random.default_rng(seed + 100 + ridx)

    pose_data = PoseData.from_times_and_poses(robot.times, robot.odom_poses)
    gt_pose_data = PoseData.from_times_and_poses(robot.times, robot.poses)

    def source(t: float):
        k = int(np.argmin(np.abs(robot.times - t)))
        pose = robot.odom_poses[k]
        obs = []
        for si in range(len(robot.seg_centers)):
            if not (robot.seg_first_seen[si] <= t <= robot.seg_last_seen[si]):
                continue
            c = robot.seg_centers[si]
            if np.linalg.norm(c[:2] - pose[:2, 3]) > 12.0:
                continue
            pts_w = c + obs_rng.normal(size=(40, 3)) * np.maximum(
                robot.seg_extent[si] / 4.0, 0.05)
            Ti = np.linalg.inv(pose)
            obs.append(
                Observation(
                    time=t, pose=pose,
                    point_cloud=pts_w @ Ti[:3, :3].T + Ti[:3, 3],
                    semantic_descriptor=robot.seg_desc[si],
                )
            )
        fd = np.ones(8, np.float32)
        return pose, obs, fd

    return source, pose_data, gt_pose_data, robot


def run(params_path: str, run_name: str, max_time: Optional[float] = None,
        t_offset: float = 0.0, verbose: bool = False) -> tuple:
    """One mapping run (reference demo/mapping.py:61-150)."""
    data_params = DataParams.from_yaml(os.path.join(params_path, "data.yaml"), run_name)
    data_params.set_run_env(run_name)
    mapper_yaml = os.path.join(params_path, "mapper.yaml")
    mapper_params = (MapperParams.from_yaml(mapper_yaml, run_name)
                     if os.path.exists(mapper_yaml) else MapperParams())
    fastsam_yaml = os.path.join(params_path, "fastsam.yaml")
    fastsam_params = (FastSAMParams.from_yaml(fastsam_yaml, run_name)
                      if os.path.exists(fastsam_yaml) else FastSAMParams())

    def clip_time(t0, tf, data_t0):
        """Apply the data.yaml time block (reference data_params.py:
        149-152: {relative, t0, tf} clips the run window)."""
        tp = data_params.time_params
        if not tp:
            return t0, tf
        base = data_t0 if tp.get("relative", True) else 0.0
        return max(t0, base + tp["t0"]), min(tf, base + tp["tf"])

    data_type = (data_params.img_data_params or {}).get("type", "sim")
    if data_type == "sim":
        source, pose_data, gt_pose_data, _ = _sim_observation_source(
            data_params, run_name, np.random.default_rng(0))
        camera = data_params.load_camera_params()
        t0 = pose_data.t0 + t_offset
        tf = pose_data.tf if max_time is None else min(pose_data.tf, t0 + max_time)
        t0, tf = clip_time(t0, tf, pose_data.t0)
        runner = MapRunner(mapper_params, fastsam_params, camera, pose_data,
                           t0=t0, tf=tf, dt=data_params.dt)
        roman_map = runner.run_observations(source, verbose=verbose)
        return roman_map, runner.times, gt_pose_data
    elif data_type in ("npz", "dir", "zip", "bag"):
        spec = data_params.img_data_params
        from roman_tpu.data.img_data import ImgData

        if data_type == "npz":
            # archive with images (T,H,W,3), depths (T,H,W), times (T,)
            img_data = ImgData.from_npz(
                os.path.expanduser(spec["path"]),
                depth_scale=spec.get("depth_scale", 1.0))
        elif data_type == "dir":
            img_data = ImgData.from_dir(
                spec["path"], depth_scale=spec.get("depth_scale", 1000.0))
        elif data_type == "bag":
            from roman_tpu.utils import expandvars_recursive as _exp

            # depth may live on a topic in the same bag (depth_topic) or
            # in a separate depth_data source (reference data.yaml
            # schema: img_data + depth_data blocks)
            dspec = data_params.depth_data_params or {}
            img_data = ImgData.from_bag(
                os.path.expanduser(_exp(spec["path"])), _exp(spec["topic"]),
                depth_topic=spec.get("depth_topic"),
                depth_scale=spec.get("depth_scale", 1000.0))
            if img_data.depths is None and dspec.get("type") == "bag":
                from roman_tpu.data import rosbag as _rosbag

                dt_, darr = _rosbag.read_images(
                    os.path.expanduser(_exp(dspec["path"])),
                    _exp(dspec["topic"]))
                if darr.dtype != np.float32:  # 16UC1 mm -> meters
                    darr = darr.astype(np.float32) / dspec.get(
                        "depth_scale", 1000.0)
                idx = np.argmin(np.abs(dt_[None, :]
                                       - img_data.times[:, None]), axis=1)
                img_data.depths = darr[idx]
        else:
            img_data = ImgData.from_zip(
                spec["path"], depth_scale=spec.get("depth_scale", 1000.0))
        images, depths, times = img_data.images, img_data.depths, img_data.times
        pose_data = data_params.load_pose_data()
        camera = data_params.load_camera_params()
        t0 = max(times[0], pose_data.t0) + t_offset
        tf = min(times[-1], pose_data.tf)
        if max_time is not None:
            tf = min(tf, t0 + max_time)
        t0, tf = clip_time(t0, tf, max(times[0], pose_data.t0))
        runner = MapRunner(mapper_params, fastsam_params, camera, pose_data,
                           t0=t0, tf=tf, dt=data_params.dt,
                           T_camera_flu=data_params.T_camera_flu)

        scale = 255.0 if images.dtype == np.uint8 else 1.0

        def get_frames(ts):
            idx = np.argmin(np.abs(times[None, :] - np.asarray(ts)[:, None]), axis=1)
            return images[idx].astype(np.float32) / scale, depths[idx]

        roman_map = runner.run(get_frames, verbose=verbose)
        return roman_map, runner.times, None
    raise ValueError(f"unsupported data type {data_type!r}")


def mapping(params_path: str, output_path: str, run_name: str,
            max_time: Optional[float] = None, viz_params=None,
            verbose: bool = False, gt_csv_path: Optional[str] = None):
    """Full mapping entry (reference demo/mapping.py:152-244): optional
    time-chunked runs merged via RomanMap.concatenate, pickle + time file
    output. For sim data, the ground-truth trajectory can be exported to
    gt_csv_path (stands in for the recorded GT the reference reads from
    bags/csv)."""
    if max_time is None:
        roman_map, times, gt_pose_data = run(params_path, run_name, verbose=verbose)
        if gt_csv_path is not None and gt_pose_data is not None:
            from roman_tpu.ops import se3_np

            t, q = se3_np.T_to_xyz_quat(gt_pose_data.poses)
            np.savetxt(gt_csv_path,
                       np.concatenate([gt_pose_data.times[:, None], t, q], axis=1))
    else:
        chunks = []
        times = None
        t_offset = 0.0
        while True:
            chunk, times, _ = run(params_path, run_name, max_time=max_time,
                                  t_offset=t_offset, verbose=verbose)
            if len(chunk.times) == 0:
                break
            chunks.append(chunk)
            t_offset += max_time
            if chunk.times[-1] >= chunk.times[0] and len(chunk.times) < 2:
                break
            # stop when the chunk did not fill the max_time window. A
            # FULL chunk spans max_time - dt (fencepost), so the bound
            # must be dt-aware — a fixed 0.9*max_time fraction silently
            # truncated runs whenever max_time <= ~10*dt
            dt_est = float(np.median(np.diff(chunk.times)))
            if (chunk.times[-1] - chunk.times[0]) < max_time - 2 * dt_est - 1e-9:
                break
        roman_map = RomanMap.concatenate(chunks)

    roman_map.save(output_path + ".pkl")
    if viz_params is not None and getattr(viz_params, "viz_3d", False):
        # third-person map-building video (reference viz.py:86-276)
        from roman_tpu.viz import render_map_video

        vid = render_map_video(
            roman_map, output_path + ".mp4",
            fps=max(getattr(viz_params, "vid_rate", 1.0) * 6.0, 1.0))
        print(f"wrote 3D map video to {vid}")
    with open(output_path + ".time.txt", "w") as f:
        for name, vals in [("fastsam", times.fastsam_times),
                           ("map", times.map_times),
                           ("total", times.total_times)]:
            if vals:
                f.write(f"{name}: avg {np.mean(vals):.4f} s/frame, "
                        f"total {np.sum(vals):.2f} s\n")
    if verbose:
        print(f"saved map with {len(roman_map.segments)} segments to "
              f"{output_path}.pkl")
    return roman_map
