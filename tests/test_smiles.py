"""Golden tests for the first-party SMILES parser."""

import numpy as np
import pytest

from druglamp_tpu.chem.smiles import parse_smiles, SmilesError


def bonds_set(mol):
    return {tuple(sorted((b.a, b.b))) + (b.order,) for b in mol.bonds}


def test_ethanol():
    mol = parse_smiles("CCO")
    assert mol.num_atoms == 3
    assert [a.symbol for a in mol.atoms] == ["C", "C", "O"]
    assert [a.total_h for a in mol.atoms] == [3, 2, 1]
    assert [a.degree for a in mol.atoms] == [1, 2, 1]
    assert len(mol.bonds) == 2


def test_benzene_aromatic():
    mol = parse_smiles("c1ccccc1")
    assert mol.num_atoms == 6
    assert all(a.aromatic for a in mol.atoms)
    assert all(a.total_h == 1 for a in mol.atoms)
    assert all(a.hybridization == "SP2" for a in mol.atoms)
    assert all(b.order == 1.5 for b in mol.bonds)
    assert len(mol.bonds) == 6
    assert all(a.in_ring for a in mol.atoms)


def test_pyridine_nitrogen_no_h():
    mol = parse_smiles("c1ccncc1")
    n_atom = [a for a in mol.atoms if a.symbol == "N"][0]
    assert n_atom.aromatic
    assert n_atom.total_h == 0


def test_toluene_substituted_carbon():
    mol = parse_smiles("Cc1ccccc1")
    ring_c_sub = mol.atoms[1]
    assert ring_c_sub.total_h == 0  # substituted aromatic carbon
    assert mol.atoms[0].total_h == 3  # methyl


def test_double_triple_bonds():
    mol = parse_smiles("C=C")
    assert mol.bonds[0].order == 2.0
    assert all(a.total_h == 2 for a in mol.atoms)
    assert all(a.hybridization == "SP2" for a in mol.atoms)

    mol = parse_smiles("C#N")
    assert mol.bonds[0].order == 3.0
    assert mol.atoms[0].total_h == 1
    assert mol.atoms[0].hybridization == "SP"
    assert mol.atoms[1].total_h == 0


def test_charges_and_bracket_h():
    mol = parse_smiles("[NH4+]")
    a = mol.atoms[0]
    assert a.symbol == "N" and a.charge == 1 and a.total_h == 4
    assert a.implicit_h == 0  # bracket atoms carry explicit H only

    mol = parse_smiles("[O-]C")
    assert mol.atoms[0].charge == -1
    assert mol.atoms[0].total_h == 0

    mol = parse_smiles("[Na+].[Cl-]")
    assert mol.num_atoms == 2
    assert len(mol.bonds) == 0
    assert mol.atoms[0].symbol == "Na"
    assert mol.atoms[1].symbol == "Cl"


def test_branches_and_rings():
    # isobutane
    mol = parse_smiles("CC(C)C")
    assert mol.atoms[1].degree == 3
    # naphthalene: 10 atoms, 11 bonds, fused carbons have 0 H
    mol = parse_smiles("c1ccc2ccccc2c1")
    assert mol.num_atoms == 10
    assert len(mol.bonds) == 11
    h_counts = sorted(a.total_h for a in mol.atoms)
    assert h_counts == [0, 0] + [1] * 8


def test_ring_closure_percent_and_explicit_bond():
    mol = parse_smiles("C1CCCCC1")
    assert len(mol.bonds) == 6
    assert all(b.order == 1.0 for b in mol.bonds)
    mol2 = parse_smiles("C%10CCCCC%10")
    assert len(mol2.bonds) == 6
    # explicit double-bond ring closure
    mol3 = parse_smiles("C=1CCCCC=1")
    orders = sorted(b.order for b in mol3.bonds)
    assert orders == [1.0] * 5 + [2.0]


def test_stereo_markers_ignored():
    mol = parse_smiles("C[C@H](N)C(=O)O")  # alanine
    assert mol.num_atoms == 6
    symbols = [a.symbol for a in mol.atoms]
    assert symbols == ["C", "C", "N", "C", "O", "O"]
    chiral = mol.atoms[1]
    assert chiral.total_h == 1  # [C@H]
    mol2 = parse_smiles("F/C=C/F")
    assert mol2.num_atoms == 4
    assert sorted(b.order for b in mol2.bonds) == [1.0, 1.0, 2.0]


def test_smiles_char_spans():
    smi = "Cc1ccccc1Br"
    mol = parse_smiles(smi)
    for atom in mol.atoms:
        assert smi[atom.smiles_pos : atom.smiles_end].upper() == atom.symbol.upper()


def test_errors():
    with pytest.raises(SmilesError):
        parse_smiles("C1CC")  # unclosed ring
    with pytest.raises(SmilesError):
        parse_smiles("C(C")  # unclosed branch
    with pytest.raises(SmilesError):
        parse_smiles("[Qq]")  # bad element


def test_dataset_smiles_parse():
    """Every SMILES in the human/random val split must parse."""
    import csv, os

    path = "/root/reference/datasets/human/random/val.csv"
    if not os.path.exists(path):
        pytest.skip("reference datasets not mounted")
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert rows
    for row in rows:
        mol = parse_smiles(row["SMILES"])
        assert mol.num_atoms >= 1


def test_parser_fuzz_no_crashes():
    """Random token soup either parses or raises SmilesError — never crashes."""
    import random

    rng = random.Random(0)
    alphabet = list("CNOSPFIclnos()[]=#123456789@+-\\/.%Br")
    ok = err = 0
    for _ in range(3000):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 30)))
        try:
            parse_smiles(s)
            ok += 1
        except SmilesError:
            err += 1
        except RecursionError:
            raise AssertionError(f"recursion blowup on {s!r}")
    assert ok + err == 3000
    assert ok > 0 and err > 0
