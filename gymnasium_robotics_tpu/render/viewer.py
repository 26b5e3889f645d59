"""Interactive ``human`` render mode: a host-side window over the software
renderer's rgb frames (the reference reaches the same mode through
MujocoRenderer's GLFW viewer, reference gymnasium_robotics/envs/robot_env.py:
282-290 / mujoco_rendering.py). TPU-side nothing changes — rendering stays a
pure function of (Model, geom_xpos, geom_xmat); this module only displays.

Backend: matplotlib's interactive window when a GUI backend is available.
Headless (no DISPLAY / Agg backend — the common case on TPU pods), the viewer
degrades gracefully: frames are kept on ``last_frame`` and ``show`` is a
no-op, mirroring how the reference fails to open a GLFW window without a
display, but without raising in the middle of a training loop.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


class HumanViewer:
    """Lazy matplotlib window; one per adapter instance."""

    def __init__(self, fps: float = 25.0):
        self.fps = max(float(fps), 1.0)
        self.last_frame: Optional[np.ndarray] = None
        self._fig = None
        self._im = None
        self._interactive = None  # tri-state: None = not probed yet
        self._t_last = 0.0

    def _probe(self) -> bool:
        if self._interactive is not None:
            return self._interactive
        try:
            import matplotlib

            backend = matplotlib.get_backend().lower()
            # Agg & friends cannot open windows; don't force-switch backends
            # behind the user's back — just record that we're headless.
            self._interactive = not backend.endswith("agg") and backend != "pdf"
        except Exception:
            self._interactive = False
        return self._interactive

    def show(self, frame: np.ndarray) -> None:
        """Display one rgb frame, paced to the env's render_fps."""
        self.last_frame = frame
        if not self._probe():
            return
        import matplotlib.pyplot as plt

        if self._fig is None:
            plt.ion()
            self._fig, ax = plt.subplots(
                figsize=(frame.shape[1] / 100, frame.shape[0] / 100)
            )
            ax.set_axis_off()
            self._im = ax.imshow(frame)
            self._fig.tight_layout(pad=0)
        else:
            self._im.set_data(frame)
        # pace to render_fps (reference MujocoRenderer sleeps the frame gap)
        now = time.perf_counter()
        wait = max(1.0 / self.fps - (now - self._t_last), 1e-3)
        self._fig.canvas.draw_idle()
        import matplotlib.pyplot as _plt

        _plt.pause(wait)
        self._t_last = time.perf_counter()

    def close(self) -> None:
        if self._fig is not None:
            import matplotlib.pyplot as plt

            plt.close(self._fig)
            self._fig = None
            self._im = None
