"""CLI: convert a model description to MJCF and optionally view it.

Usage (reference ``src/jaxsim/mujoco/__main__.py:11-192``):

    python -m jaxsim_tpu.mujoco -d model.urdf [-e out.xml] [-v] [-r out.mp4]
"""

from __future__ import annotations

import argparse
import pathlib
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="jaxsim_tpu.mujoco",
        description="Convert URDF/SDF models to MJCF and visualize them.",
    )
    parser.add_argument(
        "-d", "--description", required=True, help="URDF/SDF path"
    )
    parser.add_argument("-e", "--export", default=None, help="Write MJCF to file")
    parser.add_argument(
        "-v", "--view", action="store_true", help="Open the passive viewer"
    )
    parser.add_argument(
        "-r", "--record", default=None, help="Record an mp4 of the passive model"
    )
    parser.add_argument("--steps", type=int, default=300)
    args = parser.parse_args(argv)

    from .loaders import ModelToMjcf

    mjcf = ModelToMjcf.convert(pathlib.Path(args.description))

    if args.export:
        pathlib.Path(args.export).write_text(mjcf)
        print(f"MJCF written to {args.export}")

    if args.record:
        import mujoco

        from .visualizer import MujocoVideoRecorder

        model = mujoco.MjModel.from_xml_string(mjcf)
        data = mujoco.MjData(model)
        recorder = MujocoVideoRecorder(model, data)
        for _ in range(args.steps):
            mujoco.mj_step(model, data)
            recorder.record_frame()
        recorder.write_video(args.record)
        print(f"Video written to {args.record}")

    if args.view:
        import mujoco

        from .visualizer import MujocoVisualizer

        model = mujoco.MjModel.from_xml_string(mjcf)
        data = mujoco.MjData(model)
        viz = MujocoVisualizer(model, data)
        with viz.open() as viewer:
            import time

            while viewer.is_running():
                mujoco.mj_step(model, data)
                viz.sync(viewer)
                time.sleep(model.opt.timestep)

    return 0


if __name__ == "__main__":
    sys.exit(main())
