from sigmarl_tpu.env.env import RoadTrafficEnv, make_env  # noqa: F401
from sigmarl_tpu.env.structs import EnvConfig, WorldState  # noqa: F401
