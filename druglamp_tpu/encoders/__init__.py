from druglamp_tpu.encoders.esm2 import ESM2, ESM2Config, ESM_ALPHABET, esm2_config_for_layers  # noqa: F401
from druglamp_tpu.encoders.chemberta import ChemBERTa, ChemBERTaConfig  # noqa: F401
