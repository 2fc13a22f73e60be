"""Raw PDB/mmCIF ingestion -> seqstruc.h5 -> StructDataset end-to-end.

Covers the onboarding path the reference documents in its CIF/PDB tutorial
(reference notebooks/tutorials/Tutorial_CIF_and_PDB_loading.ipynb): parse
raw structures, write the training HDF5 layout, and load a graph batch.
"""

import os
import sys

import numpy as np
import pytest

from oneprot_tpu.data.utils.structure_io import (
    chains_from_atoms,
    ingest_files,
    parse_mmcif_atoms,
    parse_pdb_atoms,
    parse_structure_file,
)

# 3 residues x backbone atoms + one CB; enough for the graph builder.
RESIDUES = [
    ("ALA", [("N", 0.0, 1.0, 2.0), ("CA", 1.0, 1.5, 2.0),
             ("C", 2.0, 1.0, 2.5), ("CB", 1.0, 2.9, 2.2)]),
    ("GLY", [("N", 3.0, 1.2, 2.4), ("CA", 4.0, 1.8, 2.1),
             ("C", 5.0, 1.1, 2.6)]),
    ("MET", [("N", 6.0, 1.3, 2.2), ("CA", 7.0, 1.9, 2.4),
             ("C", 8.0, 1.2, 2.8), ("CB", 7.1, 3.3, 2.5)]),
]


def render_pdb(residues, chain="A", het_mse=False, extra_model=False,
               altloc_b_on_first_ca=False, unknown_tail=False):
    lines = []
    serial = 0
    for ri, (rname, atoms) in enumerate(residues, start=1):
        rec = "HETATM" if (het_mse and rname == "MSE") else "ATOM  "
        for aname, x, y, z in atoms:
            serial += 1
            lines.append(
                f"{rec}{serial:5d} {aname:<4s} {rname:>3s} {chain}"
                f"{ri:4d}    {x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00"
            )
            if altloc_b_on_first_ca and ri == 1 and aname == "CA":
                serial += 1
                lines.append(
                    f"{rec}{serial:5d} {aname:<4s}B{rname:>3s} {chain}"
                    f"{ri:4d}    {x + 9:8.3f}{y:8.3f}{z:8.3f}  0.50  0.00"
                )
    if unknown_tail:
        serial += 1
        lines.append(
            f"ATOM  {serial:5d} {'C1':<4s} {'LIG':>3s} {chain}"
            f"{len(residues) + 1:4d}    {0.0:8.3f}{0.0:8.3f}{0.0:8.3f}"
            "  1.00  0.00"
        )
    if extra_model:
        lines.append("ENDMDL")
        lines.append("MODEL        2")
        lines.append(
            f"ATOM  {1:5d} {'N':<4s} {'ALA':>3s} {chain}{1:4d}    "
            f"{99.0:8.3f}{99.0:8.3f}{99.0:8.3f}  1.00  0.00"
        )
    return "\n".join(lines) + "\n"


def render_cif(residues, chain="A"):
    head = "\n".join([
        "data_test",
        "loop_",
        "_atom_site.group_PDB",
        "_atom_site.id",
        "_atom_site.auth_atom_id",
        "_atom_site.label_alt_id",
        "_atom_site.auth_comp_id",
        "_atom_site.auth_asym_id",
        "_atom_site.auth_seq_id",
        "_atom_site.pdbx_PDB_ins_code",
        "_atom_site.Cartn_x",
        "_atom_site.Cartn_y",
        "_atom_site.Cartn_z",
        "_atom_site.pdbx_PDB_model_num",
    ])
    rows = []
    serial = 0
    for ri, (rname, atoms) in enumerate(residues, start=1):
        for aname, x, y, z in atoms:
            serial += 1
            rows.append(f"ATOM {serial} {aname} . {rname} {chain} {ri} ? "
                        f"{x:.3f} {y:.3f} {z:.3f} 1")
    return head + "\n" + "\n".join(rows) + "\n#\n"


def test_pdb_and_cif_parse_identically():
    pdb_chains = chains_from_atoms(parse_pdb_atoms(render_pdb(RESIDUES)))
    cif_chains = chains_from_atoms(parse_mmcif_atoms(render_cif(RESIDUES)))
    assert set(pdb_chains) == set(cif_chains) == {"A"}
    a, b = pdb_chains["A"], cif_chains["A"]
    assert a.seq1 == b.seq1 == "AGM"
    assert np.array_equal(a.atom_names, b.atom_names)
    assert np.array_equal(a.atom_amino_id, b.atom_amino_id)
    np.testing.assert_allclose(a.xyz, b.xyz, atol=1e-4)
    # 1-based residue ids, occurrence order
    assert a.atom_amino_id.min() == 1 and a.atom_amino_id.max() == 3


def test_pdb_edge_cases():
    text = render_pdb(RESIDUES, het_mse=True, extra_model=True,
                      altloc_b_on_first_ca=True, unknown_tail=True)
    chains = chains_from_atoms(parse_pdb_atoms(text))
    ch = chains["A"]
    # HETATM MSE kept (as M), LIG dropped, model 2 ignored, altLoc B skipped
    assert ch.seq1 == "AGM"
    n_atoms = sum(len(a) for _, a in RESIDUES)
    assert ch.xyz.shape == (n_atoms, 3)
    assert not np.any(ch.xyz == 99.0)
    assert not np.any(ch.xyz[:, 0] > 9.5)  # altLoc B x-offset excluded


def test_multichain_and_selection(tmp_path):
    two = render_pdb(RESIDUES, chain="B") + render_pdb(RESIDUES[:2],
                                                       chain="C")
    p = tmp_path / "xy.pdb"
    p.write_text(two)
    chains = parse_structure_file(str(p))
    assert set(chains) == {"B", "C"}
    assert chains["C"].seq1 == "AG"
    # chain='first' maps B -> group A
    h5_path = tmp_path / "seqstruc.h5"
    ids = ingest_files([str(p)], str(h5_path), chain="first")
    assert ids == ["xy"]
    import h5py
    with h5py.File(h5_path) as h5:
        assert h5["xy"]["structure"]["0"]["A"]["residues"]["seq1"][()] \
            == b"AGM"


def test_ingest_to_struct_dataset(tmp_path):
    # a longer synthetic protein so kNN has neighbors
    rng = np.random.RandomState(0)
    res = []
    base = np.zeros(3)
    for i in range(12):
        rname = ["ALA", "GLY", "MET", "VAL"][i % 4]
        base = base + np.array([3.8, 0.3 * (-1) ** i, 0.1])
        atoms = [(n, *(base + rng.randn(3) * 0.4))
                 for n in ("N", "CA", "C")]
        res.append((rname, atoms))
    pdb = tmp_path / "prot1.pdb"
    pdb.write_text(render_pdb(res))
    cif = tmp_path / "prot2.cif"
    cif.write_text(render_cif(res))

    out = tmp_path / "data"
    out.mkdir()
    ids = ingest_files([str(pdb), str(cif)],
                       str(out / "seqstruc.h5"))
    assert sorted(ids) == ["prot1", "prot2"]
    (out / "train_seqstruc.csv").write_text("prot1\nprot2\n")

    from oneprot_tpu.data.datasets.struct_graph_dataset import StructDataset
    ds = StructDataset(str(out), "train", max_residues=16, max_neighbors=4)
    seq_input, batch, modality, seqs = ds.collate_fn(["prot1", "prot2"])
    assert modality == "struct_graph"
    assert len(seqs) == 2 and len(seqs[0]) == 12
    assert batch["aa"].shape[0] == 2
    assert int(batch["node_mask"][0].sum()) == 12


def test_cli_main(tmp_path, monkeypatch):
    pdb = tmp_path / "abc.pdb"
    pdb.write_text(render_pdb(RESIDUES))
    out = tmp_path / "ds"
    import importlib.util
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "ingest_structures_cli",
        os.path.join(root, "scripts", "ingest_structures.py"))
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)
    monkeypatch.setattr(sys, "argv", [
        "ingest_structures.py", str(pdb), "--out", str(out),
        "--split", "val",
    ])
    assert cli.main() == 0
    assert (out / "seqstruc.h5").exists()
    assert (out / "val_seqstruc.csv").read_text().strip() == "abc"
    # idempotent re-run: no duplicate csv rows
    assert cli.main() == 0
    assert (out / "val_seqstruc.csv").read_text().strip() == "abc"
