from sigmarl_tpu.eval import metrics  # noqa: F401
from sigmarl_tpu.eval.evaluation_base import Evaluation  # noqa: F401
from sigmarl_tpu.eval.rollout import rollout  # noqa: F401
