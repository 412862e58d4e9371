"""Featurization golden tests (atom features, graph arrays, protein coding)."""

import numpy as np

from druglamp_tpu.chem.featurize import (
    ATOM_FEATURE_DIM,
    atom_features_matrix,
    drug_graph_arrays,
    integer_label_protein,
    repeat_integer_label_protein,
    repeat_pad,
    tail_pad,
    CHARPROTSET,
)
from druglamp_tpu.chem.smiles import parse_smiles
from druglamp_tpu.chem.tokenizer import SmilesTokenizer, smiles_token_edges


def test_atom_feature_dim_and_onehots():
    mol = parse_smiles("CCO")
    feats = atom_features_matrix(mol)
    assert feats.shape == (3, 74)
    c0 = feats[0]
    assert c0[0] == 1.0                      # symbol C is index 0
    assert c0[43 + 1] == 1.0                 # degree 1
    assert c0[43 + 11 + 3] == 1.0            # implicit valence 3 (CH3)
    assert c0[43 + 11 + 7] == 0.0            # formal charge 0
    assert c0[43 + 11 + 7 + 1] == 0.0        # radicals 0
    assert c0[43 + 11 + 7 + 2 + 2] == 1.0    # SP3
    assert c0[43 + 11 + 7 + 2 + 5] == 0.0    # not aromatic
    assert c0[43 + 11 + 7 + 2 + 5 + 1 + 3] == 1.0  # 3 total H
    # exactly 4 one-hot groups + flags → row sums small and positive
    assert feats.sum(axis=1).min() >= 3


def test_aromatic_flag_column():
    mol = parse_smiles("c1ccccc1")
    feats = atom_features_matrix(mol)
    arom_col = 43 + 11 + 7 + 2 + 5
    assert np.all(feats[:, arom_col] == 1.0)


def test_drug_graph_arrays_padding_and_selfloops():
    g = drug_graph_arrays("CCO", max_nodes=8)
    assert g["node_feats"].shape == (8, 75)
    assert g["adj"].shape == (8, 8)
    assert g["n_atoms"] == 3
    # virtual bit: 0 for real atoms, 1 for padding
    assert np.all(g["node_feats"][:3, 74] == 0.0)
    assert np.all(g["node_feats"][3:, 74] == 1.0)
    assert np.all(g["node_feats"][3:, :74] == 0.0)
    # double self-loop on real atoms, single on virtual
    assert np.all(np.diag(g["adj"])[:3] == 2)
    assert np.all(np.diag(g["adj"])[3:] == 1)
    # bonds both directions
    assert g["adj"][0, 1] == 1 and g["adj"][1, 0] == 1
    assert g["adj"][1, 2] == 1 and g["adj"][2, 1] == 1
    assert g["adj"][0, 2] == 0
    # degrees: C0 = 1 bond + 2 selfloops = 3; C1 = 2 + 2 = 4
    assert g["degrees"][0] == 3 and g["degrees"][1] == 4
    assert np.all(g["degrees"][3:] == 1)


def test_integer_label_protein_cls_offset():
    enc = integer_label_protein("ACD", 1022, max_length=16)
    assert enc[0] == 0                        # CLS slot
    assert enc[1] == CHARPROTSET["A"]
    assert enc[2] == CHARPROTSET["C"]
    assert enc[3] == CHARPROTSET["D"]
    assert np.all(enc[4:] == 0)


def test_repeat_integer_label_protein_tiling():
    seq = "ACD"
    enc = repeat_integer_label_protein(seq, 1022, max_length=16)
    # span = 5 (3 + CLS + SEP), quot = 3 tiles
    span = len(seq) + 2
    for i in range(16 // span):
        st = i * span
        assert enc[st] == 0
        assert enc[st + 1] == CHARPROTSET["A"]
        assert enc[st + 3] == CHARPROTSET["D"]
        assert enc[st + 4] == 0  # SEP gap
    assert np.all(enc[3 * span :] == 0)


def test_repeat_integer_truncation():
    seq = "A" * 5000
    enc = repeat_integer_label_protein(seq, 1022, max_length=2304)
    # truncated to 1022 → span 1024 → 2 tiles
    assert enc[0] == 0 and enc[1] == CHARPROTSET["A"]
    assert enc[1023] == 0 and enc[1024] == 0 and enc[1025] == CHARPROTSET["A"]
    assert np.all(enc[2048:] == 0)


def test_pads():
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    t = tail_pad(x, 5)
    assert t.shape == (5, 3)
    assert np.all(t[:2] == x) and np.all(t[2:] == 0)
    r = repeat_pad(x, 7)
    assert np.all(r[0:2] == x) and np.all(r[2:4] == x) and np.all(r[6:] == 0)


def test_token_edges_simple_chain():
    edges, node_mask = smiles_token_edges("CCO")
    # tokens C,C,O all nodes; chain edges (0,1),(1,2) both directions
    assert node_mask.tolist() == [True, True, True]
    pairs = set(map(tuple, edges.T.tolist()))
    assert pairs == {(0, 1), (1, 0), (1, 2), (2, 1)}


def test_token_edges_skip_non_node_tokens():
    edges, node_mask = smiles_token_edges("C(=O)O")
    # tokens: C ( = O ) O → node tokens C,O,O at ordinals 0,1,2
    assert node_mask.tolist() == [True, False, False, True, False, True]
    pairs = set(map(tuple, edges.T.tolist()))
    assert pairs == {(0, 1), (1, 0), (0, 2), (2, 0)}


def test_tokenizer_encode_roundtrip():
    tok = SmilesTokenizer()
    ids = tok.encode("c1ccccc1", max_length=6)
    assert len(ids) == 6
    assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id
    ids2 = tok.encode("CCO")
    assert ids2[0] == tok.cls_id and ids2[-1] == tok.sep_id and len(ids2) == 5


def test_featurization_frozen_golden_hashes():
    """Hash-locked featurization of real dataset entities: any change to the
    parser/featurizer that alters outputs must update these deliberately."""
    import csv
    import hashlib
    import os

    path = "/root/reference/datasets/human/random/val.csv"
    if not os.path.exists(path):
        import pytest

        pytest.skip("datasets not mounted")
    rows = list(csv.DictReader(open(path)))[:12]
    FEATURE_HASHES = {
        0: "5013252af2620d1444480a793614166c",
        1: "1f44ba183022fa4318f2fc81578fc6aa",
        2: "2537b21479f0d951df1c505ba7210a5c",
        3: "e2a85fb9bff847c22783d2140c83532e",
        4: "9d0cd4abb74cbfb108be55cbb58dede5",
        5: "dfca91f857e787526af99d515fb32dcf",
    }
    for i, h in FEATURE_HASHES.items():
        g = drug_graph_arrays(rows[i]["SMILES"], 512)
        got = hashlib.md5(g["node_feats"].tobytes() + g["adj"].tobytes()).hexdigest()
        assert got == h, (i, rows[i]["SMILES"])
    PROT_HASHES = {
        0: "bd3990dfa4ab3902cafaad52878230e0",
        1: "e55e511dd7e854679c8ae58480938954",
        2: "1a4e371376f729b7805669d419ad467e",
    }
    for i, h in PROT_HASHES.items():
        enc = repeat_integer_label_protein(rows[i]["Protein"], 1022)
        got = hashlib.md5(np.asarray(enc, np.int32).tobytes()).hexdigest()
        assert got == h, i


def test_oversized_molecule_unified_truncation_policy():
    """Both featurization entry points share one oversized-molecule policy:
    truncate to max_nodes with a RuntimeWarning (never raise, never silent)."""
    import warnings

    import numpy as np

    from druglamp_tpu.chem.featurize import drug_graph_arrays
    from druglamp_tpu.data.dataset import featurize_drug

    smi = "C" * 12  # linear 12-carbon chain, 12 atoms > max_nodes=8

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        g = drug_graph_arrays(smi, max_nodes=8)
    assert any("truncating" in str(x.message) for x in w)
    assert g["node_feats"].shape[0] == 8
    assert int(g["n_atoms"]) == 8
    # truncated rows carry no virtual-node bit leakage into real ones
    assert g["node_feats"][:8, -1].sum() == 0

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rec = featurize_drug(smi, 0, 8)
    assert any("truncating" in str(x.message) for x in w)
    assert rec.n_atoms == 8
    assert rec.node_feats.shape[0] == 8
    assert np.all(rec.edges < 8)
