"""Typed configuration tree.

Replaces the reference's yacs CfgNode (reference configs/default_config.py:4-61)
with frozen dataclasses, while consuming the *same* YAML files
(configs/DrugLAMP*.yaml key schema: SOLVER / RS / DECODER / COMET overlays).

The PMMA sub-config (reference configs/default_config.py:67-88,
``get_lamp_config`` / ``get_model_defaults``) is reproduced as
:class:`PMMAConfig` — including the fact that ``hidden_size`` is 2×n_hidden and
that ``mol_len`` is set equal to ``feat_len`` for the model default.  The
reference *mutates* hidden_size 256→512 inside the encoder
(model/PMMA/encoder.py:36-37); here the widening is explicit and immutable
(see nn/pmma.py).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field, replace
from typing import Any, Dict, Optional, Tuple

import yaml


@dataclass(frozen=True)
class DrugConfig:
    # reference configs/default_config.py:7-10
    node_in_feats: int = 75      # 74 canonical atom features + 1 virtual-node bit
    max_nodes: int = 512
    padding: bool = True


@dataclass(frozen=True)
class ProteinConfig:
    # reference configs/default_config.py:13-19
    kernel_size: Tuple[int, int, int] = (3, 6, 9)
    padding: bool = True
    seq_len: int = 9 * 256       # tiled integer-coded buffer length
    site_len: int = 9            # number of tiles pooled after the CNN
    max_resis: int = 1022        # truncation before tiling (dataset.py:36)


@dataclass(frozen=True)
class DecoderConfig:
    # reference configs/default_config.py:22-27
    name: str = "MLP"
    in_dim: int = 256
    hidden_dim: int = 512
    out_dim: int = 128
    binary: int = 1


@dataclass(frozen=True)
class SolverConfig:
    # reference configs/default_config.py:30-37 + configs/DrugLAMP.yaml:1-8
    max_epoch: int = 100
    batch_size: int = 16
    num_workers: int = 4
    lr: float = 1e-4
    ssl_lr: float = 3e-5
    cm_lr: float = 1e-5
    seed: int = 42
    # TPU-native additions
    eval_batch_size: int = 64    # reference evals at bs=1 (main.py:144); metric-identical
    compute_dtype: str = "bfloat16"   # matmul/attention compute dtype on TPU
    grad_mode: str = "per_loss"  # 'per_loss' (each optimizer applies its own loss's
                                 # grads) or 'legacy_aliased' (replicates the reference
                                 # trainer.py:198-229 zero_grad overwrite semantics,
                                 # where later backward passes wipe earlier grads)
    ckpt_every: int = 5          # epochs between ckpt_last (resume-point) saves;
                                 # each save pulls the full ~140MB state over the
                                 # device link. Best-metric saves are unthrottled.
    scan_chunk: int = 64         # steps per device dispatch in the epoch-in-scan
                                 # train driver (0 = per-step dispatch). Scanning
                                 # amortizes host dispatch latency — the dominant
                                 # cost on tunneled TPU hosts — with bit-identical
                                 # trajectories (tests/test_train.py)
    bn_mode: str = "global"      # 'global' (BN stats over the full global batch) or
                                 # 'per_replica' (stats per data shard, torch-DDP
                                 # emulation — reference DDP never syncs BN,
                                 # trainer.py:147; SURVEY §7 hard parts)


@dataclass(frozen=True)
class RSConfig:
    # reference configs/default_config.py:44-52
    task: bool = False           # cluster / Tcpi split mode (source_train/target_test)
    method: str = "2C2P"
    ssl: bool = False
    cm: bool = False
    init_epoch: int = 5          # CM starts at this epoch (1-based)
    epoch_step: int = 5          # SSL fires every epoch_step-th epoch
    max_margin: float = 0.5
    reset_epoch: int = 100       # margin-decay reset period (n_re)


@dataclass(frozen=True)
class ResultConfig:
    output_dir: str = field(default_factory=lambda: os.path.join(os.getcwd(), "results"))


@dataclass(frozen=True)
class CometConfig:
    # observability adapter config; console/JSONL always on
    use: bool = False
    workspace: str = ""
    project_name: str = "DrugLAMP"
    tag: str = ""


@dataclass(frozen=True)
class PMMAConfig:
    """PMMA transformer config (reference configs/default_config.py:67-88)."""
    hidden_size: int = 256            # = 2 * n_hidden
    num_heads: int = 4
    num_layers: int = 4               # num_p_plus_s_layers
    attention_dropout_rate: float = 0.0
    dropout_rate: float = 0.1
    mol_len: int = 256                # get_model_defaults: mol_len = feat_len
    feat_len: int = 256
    mlha_dropout: float = 0.0

    @staticmethod
    def for_hidden(n_hidden: int, seq_len: int = 256) -> "PMMAConfig":
        return PMMAConfig(hidden_size=2 * n_hidden, mol_len=seq_len, feat_len=seq_len)


@dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout. data axis = DP; model axis = TP for wide layers/encoders."""
    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel_size: int = 1


@dataclass(frozen=True)
class Config:
    drug: DrugConfig = field(default_factory=DrugConfig)
    protein: ProteinConfig = field(default_factory=ProteinConfig)
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    rs: RSConfig = field(default_factory=RSConfig)
    result: ResultConfig = field(default_factory=ResultConfig)
    comet: CometConfig = field(default_factory=CometConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    n_hidden: int = 128
    pmma_dropout: float = 0.1    # PMMA embed/MLP dropout (0.0 for parity studies)

    @property
    def pmma(self) -> PMMAConfig:
        # feat_len/mol_len = the site-pooled sequence length (256 by default)
        base = PMMAConfig.for_hidden(self.n_hidden,
                                     self.protein.seq_len // self.protein.site_len)
        return dataclasses.replace(base, dropout_rate=self.pmma_dropout)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


# --- YAML loading (reference-schema compatible) -----------------------------

_SECTION_FIELD_MAP = {
    "DRUG": ("drug", {"NODE_IN_FEATS": "node_in_feats", "MAX_NODES": "max_nodes",
                      "PADDING": "padding"}),
    "PROTEIN": ("protein", {"KERNEL_SIZE": "kernel_size", "PADDING": "padding",
                            "SEQ_LEN": "seq_len", "SITE_LEN": "site_len",
                            "MAX_RESIS": "max_resis"}),
    "DECODER": ("decoder", {"NAME": "name", "IN_DIM": "in_dim", "HIDDEN_DIM": "hidden_dim",
                            "OUT_DIM": "out_dim", "BINARY": "binary"}),
    "SOLVER": ("solver", {"MAX_EPOCH": "max_epoch", "BATCH_SIZE": "batch_size",
                          "NUM_WORKERS": "num_workers", "LR": "lr", "SSL_LR": "ssl_lr",
                          "CM_LR": "cm_lr", "SEED": "seed",
                          "EVAL_BATCH_SIZE": "eval_batch_size",
                          "COMPUTE_DTYPE": "compute_dtype", "GRAD_MODE": "grad_mode"}),
    "RS": ("rs", {"TASK": "task", "METHOD": "method", "SSL": "ssl", "CM": "cm",
                  "INIT_EPOCH": "init_epoch", "EPOCH_STEP": "epoch_step",
                  "MAX_MARGIN": "max_margin", "RESET_EPOCH": "reset_epoch"}),
    "RESULT": ("result", {"OUTPUT_DIR": "output_dir"}),
    "COMET": ("comet", {"USE": "use", "WORKSPACE": "workspace",
                        "PROJECT_NAME": "project_name", "TAG": "tag"}),
    "PARALLEL": ("parallel", {"DATA_AXIS": "data_axis", "MODEL_AXIS": "model_axis",
                              "MODEL_PARALLEL_SIZE": "model_parallel_size"}),
}


def _coerce(value: Any, target: Any) -> Any:
    """Coerce a YAML scalar to the dataclass field's type (yaml reads 1e-4 as str)."""
    if isinstance(target, bool):
        if isinstance(value, str):
            return value.strip().lower() in ("1", "true", "yes", "on")
        return bool(value)
    if isinstance(target, int) and not isinstance(target, bool):
        return int(value)
    if isinstance(target, float):
        return float(value)
    if isinstance(target, tuple):
        return tuple(value)
    return value


# TPU-extra YAML section for Config's top-level fields (not in the reference
# schema, which hardcodes hidden width 128; used by smoke-scale configs)
_TOP_FIELD_MAP = {"N_HIDDEN": "n_hidden", "PMMA_DROPOUT": "pmma_dropout"}


def merge_yaml_dict(cfg: Config, tree: Dict[str, Any]) -> Config:
    """Merge a reference-schema YAML dict (SOLVER/RS/... sections) into a Config."""
    updates: Dict[str, Any] = {}
    for section, payload in (tree or {}).items():
        if section == "MODEL":
            for key, value in (payload or {}).items():
                if key not in _TOP_FIELD_MAP:
                    raise KeyError(f"Unknown config key MODEL.{key}")
                fname = _TOP_FIELD_MAP[key]
                updates[fname] = _coerce(value, getattr(cfg, fname))
            continue
        if section not in _SECTION_FIELD_MAP:
            raise KeyError(f"Unknown config section: {section!r}")
        attr, key_map = _SECTION_FIELD_MAP[section]
        sub = getattr(cfg, attr)
        sub_updates = {}
        for key, value in (payload or {}).items():
            if key not in key_map:
                raise KeyError(f"Unknown config key {section}.{key}")
            fname = key_map[key]
            sub_updates[fname] = _coerce(value, getattr(sub, fname))
        updates[attr] = replace(sub, **sub_updates)
    return replace(cfg, **updates)


def load_config(yaml_path: Optional[str] = None, overrides: Optional[Dict[str, Any]] = None) -> Config:
    """Build a Config from defaults, an optional YAML overlay, and flat overrides.

    ``overrides`` uses dotted lowercase paths, e.g. ``{"solver.seed": 41}``.
    """
    cfg = Config()
    if yaml_path:
        with open(yaml_path) as f:
            tree = yaml.safe_load(f)
        cfg = merge_yaml_dict(cfg, tree)
    for dotted, value in (overrides or {}).items():
        section, _, fname = dotted.partition(".")
        sub = getattr(cfg, section)
        if not hasattr(sub, fname):
            raise KeyError(f"Unknown override {dotted}")
        cfg = replace(cfg, **{section: replace(sub, **{fname: _coerce(value, getattr(sub, fname))})})
    return cfg


def builtin_config_path(model_name: str) -> str:
    """Path of the bundled YAML for a model name (DrugLAMP / DrugLAMPwoLLM / DrugLAMP2C2P)."""
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(here, "configs", f"{model_name}.yaml")
