"""Offline video recording + live visualization
(reference ``src/jaxsim/mujoco/visualizer.py:13-385``; mp4 via imageio since
mediapy is unavailable here)."""

from __future__ import annotations

import contextlib
import pathlib

import numpy as np


class MujocoVideoRecorder:
    """Render frames offline and write an mp4."""

    def __init__(
        self,
        model,
        data,
        fps: int = 30,
        width: int = 640,
        height: int = 480,
        **kwargs,
    ) -> None:
        import mujoco

        self.model = model
        self.data = data
        self.fps = fps
        self.frames: list[np.ndarray] = []
        self.renderer = mujoco.Renderer(model, height=height, width=width)

    def reset(self, model=None, data=None) -> None:
        self.frames = []
        self.model = model if model is not None else self.model
        self.data = data if data is not None else self.data

    def render_frame(self, camera_name: str | None = None) -> np.ndarray:
        import mujoco

        mujoco.mj_forward(self.model, self.data)
        if camera_name is not None:
            self.renderer.update_scene(self.data, camera=camera_name)
        else:
            self.renderer.update_scene(self.data)
        return self.renderer.render()

    def record_frame(self, camera_name: str | None = None) -> None:
        self.frames.append(self.render_frame(camera_name=camera_name))

    def write_video(self, path: str | pathlib.Path, exist_ok: bool = True) -> None:
        path = pathlib.Path(path)
        if path.exists() and not exist_ok:
            raise FileExistsError(path)
        if path.suffix.lower() in (".mp4", ".avi"):
            # cv2 writer (no ffmpeg-backed imageio in this environment).
            import cv2

            h, w = self.frames[0].shape[:2]
            fourcc = cv2.VideoWriter_fourcc(*("mp4v" if path.suffix == ".mp4" else "XVID"))
            writer = cv2.VideoWriter(str(path), fourcc, self.fps, (w, h))
            for frame in self.frames:
                writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
            writer.release()
        else:
            import imageio

            imageio.mimsave(str(path), self.frames, fps=self.fps)


class MujocoVisualizer:
    """Passive-viewer live visualization (requires a display)."""

    def __init__(self, model=None, data=None) -> None:
        self.model = model
        self.data = data

    def sync(self, viewer, model=None, data=None) -> None:
        import mujoco

        model = model if model is not None else self.model
        data = data if data is not None else self.data
        mujoco.mj_forward(model, data)
        viewer.sync()

    @contextlib.contextmanager
    def open(self, model=None, data=None, close_on_exit: bool = True):
        import mujoco.viewer

        model = model if model is not None else self.model
        data = data if data is not None else self.data
        handle = mujoco.viewer.launch_passive(model, data)
        try:
            yield handle
        finally:
            if close_on_exit:
                handle.close()
