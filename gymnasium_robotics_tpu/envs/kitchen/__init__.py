from gymnasium_robotics_tpu.envs.kitchen.kitchen import (
    KitchenEnv, register_kitchen_envs,
)
