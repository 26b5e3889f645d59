from gymnasium_robotics_tpu.envs.adroit.adroit import (
    AdroitEnv, AdroitHandDoorEnv, AdroitHandHammerEnv, AdroitHandPenEnv,
    AdroitHandRelocateEnv, register_adroit_envs,
)
