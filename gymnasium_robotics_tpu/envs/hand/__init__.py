from gymnasium_robotics_tpu.envs.hand.hand import (
    HandManipulateBlockEnv, HandManipulateEggEnv, HandManipulateEnv,
    HandManipulatePenEnv, HandReachEnv, register_hand_envs,
)
