from druglamp_tpu.models.registry import get_model_class, MODEL_REGISTRY  # noqa: F401
from druglamp_tpu.models.druglamp import DrugLAMP, DrugLAMPwoLLM, DrugLAMP2C2P  # noqa: F401
