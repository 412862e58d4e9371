"""Native C++ featurizer parity vs the Python reference implementation."""

import csv
import glob
import os

import numpy as np
import pytest

from druglamp_tpu.chem import native
from druglamp_tpu.chem.featurize import atom_features_matrix, drug_graph_arrays
from druglamp_tpu.chem.smiles import parse_smiles

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built (make -C native)")


def _py_edges(mol):
    src, dst = [], []
    for bd in mol.bonds:
        src += [bd.a, bd.b]
        dst += [bd.b, bd.a]
    return np.array([src, dst], np.int32) if src else np.zeros((2, 0), np.int32)


@pytest.mark.parametrize("smi", [
    "CCO", "c1ccccc1", "CC(=O)O", "C#N", "[NH4+]", "[Na+].[Cl-]",
    "c1ccc2ccccc2c1", "C[C@H](N)C(=O)O", "F/C=C/F", "Cc1ccncc1Br",
    "O=C(O)c1ccccc1OC(=O)C",  # aspirin
])
def test_native_matches_python(smi):
    mol = parse_smiles(smi)
    py_feats = atom_features_matrix(mol)
    py_edges = _py_edges(mol)
    feats, edges, n = native.parse_featurize(smi)
    assert n == mol.num_atoms
    np.testing.assert_array_equal(feats, py_feats)
    np.testing.assert_array_equal(edges, py_edges)


def test_native_error_paths():
    with pytest.raises(ValueError, match="unclosed ring"):
        native.parse_featurize("C1CC")
    with pytest.raises(ValueError, match="bracket"):
        native.parse_featurize("[Zz]")
    with pytest.raises(ValueError, match="max_nodes"):
        native.parse_featurize("C" * 60, max_nodes=8)


def test_native_batch_assembly_matches_python():
    smis = ["CCO", "c1ccccc1", "CC(C)C"]
    edge_list, natoms = [], []
    for smi in smis:
        _, edges, n = native.parse_featurize(smi)
        edge_list.append(edges)
        natoms.append(n)
    adj, deg = native.assemble_batch(edge_list, np.array(natoms), N=16)
    for b, smi in enumerate(smis):
        ref = drug_graph_arrays(smi, max_nodes=16)
        np.testing.assert_array_equal(adj[b], ref["adj"])
        np.testing.assert_array_equal(deg[b], ref["degrees"])


def test_native_full_corpus_parity():
    """Every dataset SMILES: native features/edges == Python features/edges."""
    paths = glob.glob("/root/reference/datasets/human/*/*.csv")
    if not paths:
        pytest.skip("datasets not mounted")
    seen = set()
    checked = 0
    for path in paths:
        for row in csv.DictReader(open(path)):
            smi = row["SMILES"]
            if smi in seen:
                continue
            seen.add(smi)
            mol = parse_smiles(smi)
            feats, edges, n = native.parse_featurize(smi, max_nodes=512,
                                                     max_edges=8192)
            assert n == mol.num_atoms, smi
            np.testing.assert_array_equal(feats, atom_features_matrix(mol), err_msg=smi)
            np.testing.assert_array_equal(edges, _py_edges(mol), err_msg=smi)
            checked += 1
    assert checked > 1000
