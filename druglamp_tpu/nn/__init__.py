from druglamp_tpu.nn.norms import GainLayerNorm  # noqa: F401
from druglamp_tpu.nn.gcn import MolecularGCN  # noqa: F401
from druglamp_tpu.nn.protein_cnn import ProteinCNN  # noqa: F401
from druglamp_tpu.nn.gca import GuidedCrossAttention  # noqa: F401
from druglamp_tpu.nn.mhla import MultiHeadLinearAttention  # noqa: F401
from druglamp_tpu.nn.pmma import PairedMultimodalAttention  # noqa: F401
from druglamp_tpu.nn.mlp import MLPClassifier, FeedForwardLayer  # noqa: F401
