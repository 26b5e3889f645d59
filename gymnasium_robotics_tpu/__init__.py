"""gymnasium_robotics_tpu: TPU-native batched robotics environments.

A ground-up JAX re-design of the capabilities of Gymnasium-Robotics
(reference mounted read-only during development): batched pure-JAX physics in
the MJX style, GoalEnv contract as vectorized pure functions, env families as
pytree state machines under jit/vmap, sharded over TPU meshes.
"""

__version__ = "0.2.0"

# Physics needs true float32 matmuls: TPU defaults to bfloat16 passes, which
# destroys the conditioning of the mass matrix (CRB's F @ cdof^T) and of the
# Newton Hessian M + J^T D J for stiff scenes (kitchen solref) — observed as
# NaN trajectories on a v5e while CPU was fine. Same requirement as MJX.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
