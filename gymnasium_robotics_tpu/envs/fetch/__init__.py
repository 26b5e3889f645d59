from gymnasium_robotics_tpu.envs.fetch.fetch import (
    FetchEnv, FetchPickAndPlaceEnv, FetchPushEnv, FetchReachEnv, FetchSlideEnv,
)
