"""druglamp_tpu — a TPU-native JAX framework for multimodal drug–target interaction.

A ground-up rebuild of the capabilities of the DrugLAMP reference
(Lzcstan/DrugLAMP) designed for TPU hardware:

- host-side featurization pipeline (first-party SMILES parser replaces RDKit/DGL)
  emitting fixed-shape padded numpy batches,
- flax.linen model zoo (GCN / ProteinCNN / PGCA / MHLA / PMMA) with dense,
  MXU-friendly formulations (padded 512-node molecular graphs as normalized
  adjacency matmuls instead of sparse message passing),
- fused Pallas TPU kernels for the attention hot spots,
- jit/pjit training with a `jax.sharding.Mesh` (data parallel by default,
  tensor-parallel shardings for the large frozen encoders),
- orbax checkpointing, streaming AUROC/AUPRC model selection, 5-seed sweeps.

Reference parity map lives in each module's docstring (file:line cites point at
/root/reference).
"""

__version__ = "0.1.0"

from druglamp_tpu.config import Config, load_config  # noqa: F401
