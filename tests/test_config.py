from druglamp_tpu.config import Config, builtin_config_path, load_config


def test_defaults():
    cfg = Config()
    assert cfg.drug.node_in_feats == 75
    assert cfg.drug.max_nodes == 512
    assert cfg.protein.seq_len == 2304
    assert cfg.protein.site_len == 9
    assert cfg.pmma.hidden_size == 256
    assert cfg.pmma.num_heads == 4
    assert cfg.pmma.mol_len == cfg.pmma.feat_len == 256


def test_load_druglamp_yaml():
    cfg = load_config(builtin_config_path("DrugLAMP"))
    assert cfg.solver.batch_size == 16
    assert cfg.solver.max_epoch == 100
    assert cfg.solver.lr == 1e-4
    assert cfg.solver.ssl_lr == 3e-5
    assert cfg.solver.cm_lr == 1e-5
    assert cfg.rs.ssl is True and cfg.rs.cm is False
    assert cfg.rs.init_epoch == 5 and cfg.rs.epoch_step == 5
    assert cfg.decoder.binary == 1


def test_load_2c2p_yaml():
    cfg = load_config(builtin_config_path("DrugLAMP2C2P"))
    assert cfg.rs.cm is True
    assert cfg.solver.cm_lr == 3e-5


def test_overrides():
    cfg = load_config(builtin_config_path("DrugLAMP"), {"solver.seed": 41, "rs.task": True})
    assert cfg.solver.seed == 41
    assert cfg.rs.task is True


def test_unknown_yaml_keys_raise(tmp_path):
    import pytest
    import yaml

    bad = tmp_path / "bad.yaml"
    bad.write_text(yaml.dump({"SOLVER": {"NOT_A_KEY": 1}}))
    with pytest.raises(KeyError, match="NOT_A_KEY"):
        load_config(str(bad))
    bad2 = tmp_path / "bad2.yaml"
    bad2.write_text(yaml.dump({"NOTASECTION": {}}))
    with pytest.raises(KeyError, match="NOTASECTION"):
        load_config(str(bad2))


def test_override_unknown_raises():
    import pytest

    with pytest.raises(KeyError):
        load_config(None, {"solver.not_a_field": 1})


def test_scientific_notation_lr():
    cfg = load_config(builtin_config_path("DrugLAMP"), {"solver.lr": "3e-5"})
    assert cfg.solver.lr == 3e-5
