from druglamp_tpu.losses.classification import binary_cross_entropy, cross_entropy_logits  # noqa: F401
from druglamp_tpu.losses.schedules import (  # noqa: F401
    tanh_decay,
    cosine_anneal,
    max_cosine_tanh_decay,
    no_decay,
    MarginSchedule,
)
from druglamp_tpu.losses.masking import mlm_mask  # noqa: F401
