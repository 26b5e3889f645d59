from gymnasium_robotics_tpu.render.renderer import (  # noqa: F401
    CameraConfig, render_frame,
)
