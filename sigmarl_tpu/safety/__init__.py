from sigmarl_tpu.safety.cbf_qp import CBFConfig, CBFSafetyFilter, CBFStepInfo  # noqa: F401
