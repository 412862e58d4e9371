from druglamp_tpu.eval.metrics import (  # noqa: F401
    auroc,
    average_precision,
    binary_metrics,
    MetricCollector,
)
