from druglamp_tpu.data.dataset import DTIDataset, EntityTable  # noqa: F401
from druglamp_tpu.data.loader import BatchLoader, build_cm_arrays  # noqa: F401
from druglamp_tpu.data.cache import EmbeddingCache, ZeroEmbeddings  # noqa: F401
