from druglamp_tpu.utils.logging import ExperimentLogger  # noqa: F401
