from sigmarl_tpu.rl.mappo_cavs import MAPPOCAVs, mappo_cavs  # noqa: F401
