from druglamp_tpu.train.schedule import cosine_warmup_restarts_lr  # noqa: F401
