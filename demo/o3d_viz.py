"""Name-parity entry point for reference demo/o3d_viz.py (3D view of a
saved map pickle). The renderer is matplotlib-based (no open3d in this
environment) and lives in demo/map_viz.py; this forwards to it so
reference invocations `python demo/o3d_viz.py <map.pkl> [--show-text]
[--no-orig] [-t T0 T1]` keep working."""

import os
import runpy

if __name__ == "__main__":
    runpy.run_path(
        os.path.join(os.path.dirname(os.path.realpath(__file__)),
                     "map_viz.py"),
        run_name="__main__")
