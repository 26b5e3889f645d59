"""gymnasium_robotics_tpu: TPU-native batched robotics environments.

A ground-up JAX re-design of the capabilities of Gymnasium-Robotics
(reference mounted read-only during development): batched pure-JAX physics in
the MJX style, GoalEnv contract as vectorized pure functions, env families as
pytree state machines under jit/vmap, sharded over TPU meshes.
"""

__version__ = "0.1.0"
