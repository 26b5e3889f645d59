from gymnasium_robotics_tpu.physics import types
from gymnasium_robotics_tpu.physics.types import Model, Data, Contact
