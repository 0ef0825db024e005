"""Full ROMAN-TPU pipeline: mapping -> submap alignment -> robust PGO.

CLI parity with reference demo/demo.py (same flags, same output tree:
map/ align/ offline_rpgo/{sparse,dense} params/, same stage-skip
restartability), with the Kimera-RPGO subprocess replaced by the in-process
TPU robust PGO (roman_tpu.rpgo.solver) and ATE evaluation by
roman_tpu.rpgo.evaluate.
"""

import argparse
import os
import shutil
import sys

# Persistent XLA compile cache: on-chip runs remote-compile the alignment
# program through the tunnel (minutes); repeat runs with stable program
# signatures then hit this cache (same setup as bench.py).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/roman_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

import mapping  # noqa: E402
from roman_tpu.params.data_params import DataParams  # noqa: E402
from roman_tpu.params.offline_rpgo_params import OfflineRPGOParams  # noqa: E402
from roman_tpu.params.submap_align_params import (  # noqa: E402
    SubmapAlignInputOutput,
    SubmapAlignParams,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-p", "--params", required=True,
                        help="Params directory (data.yaml required; fastsam/"
                             "mapper/submap_align/offline_rpgo.yaml optional)")
    parser.add_argument("-o", "--output-dir", required=True)
    parser.add_argument("-r", "--runs", type=str, nargs="+", default=None)
    parser.add_argument("-m", "--viz-map", action="store_true")
    parser.add_argument("-v", "--viz-observations", action="store_true")
    parser.add_argument("-3", "--viz-3d", action="store_true")
    parser.add_argument("--vid-rate", type=float, default=1.0)
    parser.add_argument("-d", "--save-img-data", action="store_true")
    parser.add_argument("-n", "--num-req-assoc", type=int, default=4)
    parser.add_argument("--max-time", type=float, default=None)
    parser.add_argument("--skip-map", action="store_true")
    parser.add_argument("--skip-align", action="store_true")
    parser.add_argument("--skip-rpgo", action="store_true")
    parser.add_argument("--skip-indices", type=int, nargs="+")
    parser.add_argument("--skip-self-lc", action="store_true")
    parser.add_argument("--skip-distance", type=float, default=np.inf)
    parser.add_argument("--cpu", action="store_true",
                        help="force jax onto CPU (this environment pins "
                             "JAX_PLATFORMS in sitecustomize)")
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="capture a JAX profiler trace of the whole run "
                             "to DIR (view with xprof/tensorboard)")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.profile:
        import atexit

        import jax

        jax.profiler.start_trace(args.profile)
        atexit.register(jax.profiler.stop_trace)

    params_dir = args.params
    sa_path = os.path.join(params_dir, "submap_align.yaml")
    submap_align_params = (SubmapAlignParams.from_yaml(sa_path)
                           if os.path.exists(sa_path) else SubmapAlignParams())
    rp_path = os.path.join(params_dir, "offline_rpgo.yaml")
    offline_rpgo_params = (OfflineRPGOParams.from_yaml(rp_path)
                           if os.path.exists(rp_path) else OfflineRPGOParams())
    data_params = DataParams.from_yaml(os.path.join(params_dir, "data.yaml"))
    if args.runs is not None:
        data_params.runs = args.runs
    runs = data_params.runs

    # output tree (demo.py:89-95)
    for sub in ["map", "align", "offline_rpgo", "offline_rpgo/sparse",
                "offline_rpgo/dense", "params", "gt"]:
        os.makedirs(os.path.join(args.output_dir, sub), exist_ok=True)
    for f in os.listdir(params_dir):
        if f.endswith(".yaml"):
            shutil.copy(os.path.join(params_dir, f),
                        os.path.join(args.output_dir, "params", f))

    # ground truth (demo.py:81-87): explicit gt_pose.yaml, or sim-exported
    gt_yaml = os.path.join(params_dir, "gt_pose.yaml")
    has_gt_yaml = os.path.exists(gt_yaml)

    # ---- stage 1: mapping (demo.py:104-133) ----
    if not args.skip_map:
        for i, run_name in enumerate(runs):
            if args.skip_indices and i in args.skip_indices:
                continue
            print(f"\n----------\nMapping: {run_name}\n----------")
            mapping.mapping(
                params_path=params_dir,
                output_path=os.path.join(args.output_dir, "map", run_name),
                run_name=run_name,
                max_time=args.max_time,
                viz_params=mapping.VisualizationParams(
                    viz_map=args.viz_map,
                    viz_observations=args.viz_observations,
                    viz_3d=args.viz_3d,
                ),
                verbose=True,
                gt_csv_path=os.path.join(args.output_dir, "gt", f"{run_name}.csv"),
            )

    gt_files = []
    for run_name in runs:
        if has_gt_yaml:
            gt_files.append(gt_yaml)
        else:
            csv = os.path.join(args.output_dir, "gt", f"{run_name}.csv")
            if os.path.exists(csv):
                import yaml as _yaml

                y = os.path.join(args.output_dir, "gt", f"{run_name}.yaml")
                with open(y, "w") as f:
                    _yaml.dump({"type": "csv", "path": csv}, f)
                gt_files.append(y)
            else:
                gt_files.append(None)
    has_gt = all(g is not None for g in gt_files)

    # ---- stage 2: submap alignment (demo.py:135-161) ----
    if not args.skip_align:
        from roman_tpu.align.submap_align import submap_align

        for i in range(len(runs)):
            if args.skip_indices and i in args.skip_indices:
                continue
            for j in range(i, len(runs)):
                if args.skip_self_lc and i == j:
                    continue
                if args.skip_indices and j in args.skip_indices:
                    continue
                out_dir = os.path.join(args.output_dir, "align", f"{runs[i]}_{runs[j]}")
                os.makedirs(out_dir, exist_ok=True)
                sm_io = SubmapAlignInputOutput(
                    inputs=[os.path.join(args.output_dir, "map", f"{runs[i]}.pkl"),
                            os.path.join(args.output_dir, "map", f"{runs[j]}.pkl")],
                    output_dir=out_dir,
                    run_name="align",
                    lc_association_thresh=args.num_req_assoc,
                    input_gt_pose_yaml=[gt_files[i], gt_files[j]],
                    robot_names=[runs[i], runs[j]],
                    robot_env=data_params.run_env,
                    skip_distance=args.skip_distance,
                )
                submap_align_params.single_robot_lc = (i == j)
                print(f"\n----------\nAligning: {runs[i]} <-> {runs[j]}\n----------")
                submap_align(sm_params=submap_align_params, sm_io=sm_io)

    # ---- stage 3: offline robust PGO (demo.py:163-302) ----
    if not args.skip_rpgo:
        from roman_tpu.rpgo.extract_odom import roman_map_pkl_to_g2o
        from roman_tpu.rpgo.fusion import create_config, g2o_file_fusion
        from roman_tpu.rpgo.combine_loop_closures import combine_loop_closures
        from roman_tpu.rpgo.g2o_io import (
            edit_g2o_edge_information,
            g2o_and_time_to_pose_data,
            pose_data_to_csv,
        )
        from roman_tpu.rpgo.solver import RPGOSolverParams, rpgo_solve_g2o
        from roman_tpu.rpgo.evaluate import evaluate
        from roman_tpu.rpgo.plot_g2o import (
            DEFAULT_TRAJECTORY_COLORS,
            G2OPlotParams,
            plot_g2o,
        )

        out = args.output_dir
        min_kf = 0.01 if not offline_rpgo_params.sparsified else 2.0
        for i, run_name in enumerate(runs):
            for mode, kf in [("sparse", min_kf), ("dense", None)]:
                roman_map_pkl_to_g2o(
                    pkl_file=os.path.join(out, "map", f"{run_name}.pkl"),
                    g2o_file=os.path.join(out, "offline_rpgo", mode, f"{run_name}.g2o"),
                    time_file=os.path.join(out, "offline_rpgo", mode,
                                           f"{run_name}.time.txt"),
                    robot_id=i,
                    min_keyframe_dist=kf,
                    t_std=offline_rpgo_params.odom_t_std,
                    r_std=offline_rpgo_params.odom_r_std,
                    verbose=True,
                )
        for mode in ["sparse", "dense"]:
            with open(os.path.join(out, "offline_rpgo", mode, "odom_all.time.txt"),
                      "w") as f:
                for run_name in runs:
                    with open(os.path.join(out, "offline_rpgo", mode,
                                           f"{run_name}.time.txt")) as f2:
                        f.write(f2.read())

        sparse_all = os.path.join(out, "offline_rpgo/sparse", "odom_all.g2o")
        g2o_file_fusion(
            create_config(runs, os.path.join(out, "offline_rpgo/sparse")),
            sparse_all, thresh=args.num_req_assoc)
        dense_all = os.path.join(out, "offline_rpgo/dense", "odom_and_lc.g2o")
        g2o_file_fusion(
            create_config(runs, os.path.join(out, "offline_rpgo/dense"),
                          submap_align_dir=os.path.join(out, "align"),
                          align_file_name="align"),
            dense_all, thresh=args.num_req_assoc)

        if offline_rpgo_params.sparsified:
            final_g2o = os.path.join(out, "offline_rpgo", "odom_and_lc.g2o")
            combine_loop_closures(
                g2o_reference=sparse_all,
                g2o_extra_lc=dense_all,
                vertex_times_reference=os.path.join(out, "offline_rpgo/sparse",
                                                    "odom_all.time.txt"),
                vertex_times_extra_lc=os.path.join(out, "offline_rpgo/dense",
                                                   "odom_all.time.txt"),
                output_file=final_g2o,
            )
            time_file = os.path.join(out, "offline_rpgo/sparse", "odom_all.time.txt")
        else:
            final_g2o = dense_all
            time_file = os.path.join(out, "offline_rpgo/dense", "odom_all.time.txt")

        with open(final_g2o) as f:
            lines = f.readlines()
        lines = edit_g2o_edge_information(
            lines, offline_rpgo_params.lc_t_std, offline_rpgo_params.lc_r_std,
            loop_closures=True)
        with open(final_g2o, "w") as f:
            for line in lines:
                f.write(line + "\n")

        # the robust solve (replaces the RpgoReadG2o subprocess, demo.py:246-250)
        result_g2o = rpgo_solve_g2o(
            final_g2o, os.path.join(out, "offline_rpgo"),
            RPGOSolverParams(gnc_iters=offline_rpgo_params.gnc_iters,
                             gn_iters=offline_rpgo_params.gn_iters,
                             pcm_gate=offline_rpgo_params.pcm_gate))

        # plots (demo.py:253-277)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        sym_to_name = {chr(97 + i): runs[i] for i in range(len(runs))}
        fig, ax = plt.subplots(2, 2, figsize=(10, 10),
                               gridspec_kw={"height_ratios": [5, 1],
                                            "width_ratios": [5, 1]})
        pp = G2OPlotParams()
        for k in range(3):
            pp.axes = [(0, 1), (0, 2), (2, 1)][k]
            pp.legend = (k == 0)
            plot_g2o(result_g2o, sym_to_name, DEFAULT_TRAJECTORY_COLORS,
                     ax=ax[[(0, 0), (1, 0), (0, 1)][k]], params=pp)
        ax[1, 1].axis("off")
        fig.savefig(os.path.join(out, "offline_rpgo", "result.png"))
        plt.close(fig)

        # per-run optimized trajectories (demo.py:280-285)
        for i, run_name in enumerate(runs):
            pd = g2o_and_time_to_pose_data(result_g2o, time_file, robot_id=i)
            pose_data_to_csv(pd, os.path.join(out, "offline_rpgo", f"{run_name}.csv"))

        # ATE (demo.py:288-302)
        if has_gt:
            ate = evaluate(result_g2o, time_file,
                           {i: gt_files[i] for i in range(len(gt_files))},
                           {i: runs[i] for i in range(len(runs))},
                           data_params.run_env, output_dir=out)
            print("ATE results:\n============")
            print(ate)
            with open(os.path.join(out, "offline_rpgo", "ate_rmse.txt"), "w") as f:
                print(ate, file=f)


if __name__ == "__main__":
    main()
