"""Data-layer tests on hermetic synthetic fixtures (SURVEY §4: the reference
lacks offline fixtures entirely — this suite runs the full matrix offline)."""

import numpy as np
import pytest

from oneprot_tpu.data.datamodule import DATASET_CLASSES, OneProtDataModule
from oneprot_tpu.data.synthetic import generate_fixtures
from oneprot_tpu.data.utils import graphs as G
from oneprot_tpu.data.utils.msa_io import greedy_select, read_msa, remove_insertions


@pytest.fixture(scope="session")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fixtures")
    generate_fixtures(str(d), n_train=12, n_eval=6, seed=0)
    return str(d)


def _mk(modality, data_dir, split="train", **kw):
    cls = DATASET_CLASSES[modality]
    base = dict(data_dir=data_dir, split=split, buckets=[32, 64, 128])
    if modality == "struct_token":
        base["filename"] = f"{data_dir}/train_saprot.h5"
    if modality == "pocket":
        base.update(pocket=True, max_residues=32, max_neighbors=8)
    if modality == "struct_graph":
        base.update(max_residues=64, max_neighbors=8)
    if modality == "msa":
        base["msa_depth"] = 4
    base.update(kw)
    return cls(**base)


def test_struct_token_dataset(data_dir):
    ds = _mk("struct_token", data_dir)
    assert len(ds) == 12
    seq, st, modality, raws = ds.collate_fn([ds[0], ds[1]])
    assert modality == "struct_token"
    assert seq.shape == st.shape and seq.shape[0] == 2
    assert seq.shape[1] in (32, 64, 128)  # bucketed
    # struct tokens use the +21 vocab rows
    assert st.max() >= 33


def test_text_dataset(data_dir):
    ds = _mk("text", data_dir)
    seq, text, modality, raws = ds.collate_fn([ds[0], ds[1], ds[2]])
    assert modality == "text" and seq.shape[0] == 3 and text.shape[0] == 3
    assert len(raws) == 3 and all(isinstance(s, str) for s in raws)


@pytest.mark.parametrize("mod", ["struct_graph", "pocket"])
def test_struct_graph_dataset(data_dir, mod):
    ds = _mk(mod, data_dir)
    rng = np.random.RandomState(0)
    seq, graph, modality, raws = ds.collate_fn([ds[0], ds[1]], rng=rng)
    assert modality == mod
    n_max = 32 if mod == "pocket" else 64
    assert graph["aa"].shape == (2, n_max)
    assert graph["coords_ca"].shape == (2, n_max, 3)
    assert graph["bb_embs"].shape == (2, n_max, 6)
    assert graph["side_chain_embs"].shape == (2, n_max, 8)
    assert graph["neighbor_idx"].shape == (2, n_max, 8)
    assert graph["node_mask"].sum() > 0
    # masked-out padding has zero neighbors
    pad = graph["node_mask"][0] == 0
    assert graph["neighbor_mask"][0][pad].sum() == 0


def test_struct_graph_augmentations_trainonly(data_dir):
    ds = _mk("struct_graph", data_dir, use_struct_coord_noise=True,
             use_struct_deform=True, use_struct_mask=True)
    r1 = ds.collate_fn([ds[0]], rng=np.random.RandomState(1))
    r2 = ds.collate_fn([ds[0]], rng=np.random.RandomState(2))
    assert not np.allclose(r1[1]["coords_ca"], r2[1]["coords_ca"])
    ds_val = _mk("struct_graph", data_dir, split="val",
                 use_struct_coord_noise=True)
    v1 = ds_val.collate_fn([ds_val[0]], rng=np.random.RandomState(1))
    v2 = ds_val.collate_fn([ds_val[0]], rng=np.random.RandomState(2))
    np.testing.assert_array_equal(v1[1]["coords_ca"], v2[1]["coords_ca"])


def test_msa_dataset(data_dir):
    ds = _mk("msa", data_dir)
    seq, msa, modality, raws = ds.collate_fn([ds[0], ds[1]])
    assert modality == "msa"
    assert msa.ndim == 3 and msa.shape[0] == 2
    assert msa.shape[1] <= 4  # depth-capped
    assert msa[0, 0, 0] == 0  # per-row cls


def test_seqsim_dataset(data_dir):
    ds = _mk("seqsim", data_dir)
    s1, s2, modality, _ = ds.collate_fn(
        [ds[0], ds[1]], rng=np.random.RandomState(0))
    assert modality == "seqsim"
    # 3 entries per item (reference seqsim_dataset.py:80-121)
    assert s1.shape[0] == 6 and s2.shape[0] == 6


def test_seqsim_missing_mutation_entry_falls_back_to_wild_type(data_dir):
    """A sequence present in the seqsim txt but absent from a clinvar
    mutation JSON (data drift) must fall back to the wild type like an
    invalid mutation does — not crash the epoch with a KeyError from the
    prefetch thread (review finding, round 5)."""
    ds = _mk("seqsim", data_dir)
    ds.benign_mutations = {}      # simulate drift: no entries at all
    ds.pathogenic_mutations = {}
    s1, s2, modality, raws = ds.collate_fn(
        [ds[0]], rng=np.random.RandomState(0))
    assert modality == "seqsim" and s1.shape[0] == 3


def test_val_len_capped_at_1000(data_dir):
    ds = _mk("struct_token", data_dir, split="val")
    assert len(ds) == 6  # min(n, 1000)


def test_datamodule_combined_min_size(data_dir):
    modalities = {
        "struct_token": {
            "dataset": {"data_dir": data_dir,
                        "filename": f"{data_dir}/train_saprot.h5"},
            "batch_size": {"train": 4, "val": 4, "test": 4},
        },
        "text": {
            "dataset": {"data_dir": data_dir},
            "batch_size": {"train": 6, "val": 4, "test": 4},
        },
    }
    dm = OneProtDataModule(modalities, default_batch_size=4,
                           buckets=[64, 128], prefetch=1)
    dm.setup()
    train_batches = list(dm.train_dataloader())
    # min_size: 12/4=3 vs 12/6=2 -> 2 combined batches
    assert len(train_batches) == 2
    assert set(train_batches[0].keys()) == {"struct_token", "text"}
    val_batches = list(dm.val_dataloader())
    # sequential: flat stream over both modalities
    mods = {b[2] for b in val_batches}
    assert mods == {"struct_token", "text"}


def test_greedy_select_diversity():
    msa = [("q", "AAAA"), ("a", "AAAT"), ("b", "TTTT"), ("c", "AATT")]
    out = greedy_select(msa, 2)
    assert out[0][0] == "q"
    assert out[1][0] == "b"  # max hamming from query


def test_remove_insertions():
    assert remove_insertions("AbC.dE*F") == "ACEF"


def test_dihedral_math_properties():
    # phi/psi/omega of an ideal extended chain are finite and bounded
    rng = np.random.RandomState(0)
    n = 10
    pos_ca = np.cumsum(rng.normal(3.8, 0.1, (n, 3)), axis=0)
    pos_n = pos_ca + rng.normal(0, 0.5, (n, 3))
    pos_c = pos_ca + rng.normal(0, 0.5, (n, 3))
    bb = G.backbone_embeddings(pos_n, pos_ca, pos_c)
    assert bb.shape == (n, 6)
    # cos^2+sin^2 == 1 for interior angles (padded zeros give 1 as cos(0)=1)
    s = bb[:, :3] ** 2 + bb[:, 3:] ** 2
    np.testing.assert_allclose(s[1:-1], 1.0, atol=1e-5)
    # first residue phi (angle[0,0]) was padded to 0 -> cos=1, sin=0
    assert bb[0, 0] == 1.0 and bb[0, 3] == 0.0


def test_knn_neighbors_masking():
    coords = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [50, 0, 0]], float)
    idx, mask = G.knn_neighbors(coords, k=3, cutoff=10.0)
    assert idx.shape == (4, 3)
    assert mask[0].sum() == 2  # residue 3 out of cutoff
    assert mask[3].sum() == 0  # far residue has no in-cutoff neighbors
    assert idx[0, 0] == 1  # sorted by distance


def test_length_grouped_batching(tmp_path):
    """Shuffled loaders sort megabatch windows by item length so batches
    land in small buckets (the production realization of the bench's
    bucketing win)."""
    from oneprot_tpu.data.datamodule import DataLoader

    class Toy:
        def __init__(self, n=64):
            self.lens = np.arange(n) % 32 + 4

        def __len__(self):
            return len(self.lens)

        def __getitem__(self, i):
            return int(i)

        def lengths(self):
            return self.lens

        def collate_fn(self, items, rng=None):
            return [self.lens[i] for i in items]

    ds = Toy()
    loader = DataLoader(ds, batch_size=8, shuffle=True, seed=0, prefetch=0)
    spreads = []
    for batch in loader:
        spreads.append(max(batch) - min(batch))
    # grouped batches have near-uniform lengths; random batches would have
    # spread ~24 on this distribution
    assert np.mean(spreads) < 8, spreads

    ungrouped = DataLoader(ds, batch_size=8, shuffle=True, seed=0,
                           prefetch=0, group_by_length=False)
    spreads_u = [max(b) - min(b) for b in ungrouped]
    assert np.mean(spreads_u) > np.mean(spreads)


def test_struct_token_lengths_match_data(tmp_path):
    from oneprot_tpu.data.datasets.struct_token_dataset import (
        StructTokenDataset,
    )
    from oneprot_tpu.data.synthetic import generate_fixtures

    import os

    d = str(tmp_path / "fx")
    generate_fixtures(d, n_train=8, n_eval=4, modalities=["struct_token"])
    ds = StructTokenDataset(d, os.path.join(d, "train_saprot.h5"), "train")
    lens = ds.lengths()
    assert lens.shape == (8,)
    # oracle: collate one item and compare true token count
    for i in range(4):
        seq_in, _, _, seqs = ds.collate_fn([ds[i]])
        true_len = len(seqs[0]) + 2
        assert lens[i] == true_len, (lens[i], true_len)


# ---------------------------------------------------------------------------
# Value-parity vs the reference's own torch dihedral code (VERDICT r4 #5):
# the property test above pins invariants only; these pin exact VALUES of
# compute_dihedrals / backbone_embeddings / side_chain_embeddings /
# atom_positions against /root/reference/src/data/utils/struct_graph_utils.py
# (lines 31-144) executed directly (torch_geometric stubbed; torch/h5py/scipy
# are installed). Closes the last offline-closable slice of the GNN input
# contract (SURVEY hard-part 2).
# ---------------------------------------------------------------------------

_REF_SGU = "/root/reference/src/data/utils/struct_graph_utils.py"


@pytest.fixture(scope="session")
def ref_sgu(tmp_path_factory):
    import importlib.util
    import os
    import sys
    import types

    if not os.path.exists(_REF_SGU):
        pytest.skip("reference checkout not available")
    if "ref_struct_graph_utils" in sys.modules:
        return sys.modules["ref_struct_graph_utils"]
    # the reference imports torch_geometric (not installed here) only for
    # the Data/InMemoryDataset containers its protein_to_graph returns —
    # the math under test never touches them, so stub the module surface
    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        tgd = types.ModuleType("torch_geometric.data")
        tgd.Data = type("Data", (), {})
        tgd.InMemoryDataset = type("InMemoryDataset", (), {})
        tg.data = tgd
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.data"] = tgd
    # its module body calls logging.basicConfig(filename='create_dataset.log')
    # which creates a file in cwd: import from a throwaway directory
    cwd = os.getcwd()
    os.chdir(tmp_path_factory.mktemp("ref_import"))
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_struct_graph_utils", _REF_SGU)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_struct_graph_utils"] = mod
        spec.loader.exec_module(mod)
    finally:
        os.chdir(cwd)
    return mod


def test_compute_dihedrals_value_parity(ref_sgu):
    import torch

    rng = np.random.RandomState(3)
    v1 = rng.randn(64, 3)
    v2 = rng.randn(64, 3)
    v3 = rng.randn(64, 3)
    # v2=0 exercises both nan_to_num branches (0/0 -> atan2(0,0) -> 0).
    # EXACTLY-parallel vectors are deliberately absent: their cross product
    # is rounding noise (~1e-18) in torch but exactly 0 in numpy, so the
    # resulting angle is undefined in both; near-parallel rows are the
    # stable version of that edge.
    v2[5] = 0.0
    v3[9] = v2[9] + 1e-3 * rng.randn(3)
    v1[17] = v2[17] + 1e-3 * rng.randn(3)
    ours = G.compute_dihedrals(v1, v2, v3)
    theirs = ref_sgu.compute_diherals(
        torch.tensor(v1), torch.tensor(v2), torch.tensor(v3)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_backbone_embeddings_value_parity(ref_sgu):
    import torch

    rng = np.random.RandomState(4)
    n = 23
    pos_ca = np.cumsum(rng.normal(3.8, 0.2, (n, 3)), axis=0)
    pos_n = pos_ca + rng.normal(0, 0.6, (n, 3))
    pos_c = pos_ca + rng.normal(0, 0.6, (n, 3))
    ours = G.backbone_embeddings(pos_n, pos_ca, pos_c)
    X = torch.cat([torch.tensor(p, dtype=torch.float64).unsqueeze(1)
                   for p in (pos_n, pos_ca, pos_c)], dim=1)
    theirs = ref_sgu.calc_bb_embs(X)
    theirs = torch.nan_to_num(theirs).numpy()  # protein_to_graph NaN->0 (ref :212)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def _synthetic_atoms(rng, n_res):
    """Per-residue atom records covering every torsion group, with gaps:
    glycine-like residues (no CB and beyond) and partial side chains."""
    names, amino_id, pos = [], [], []
    full = ["N", "CA", "C", "CB", "CG", "CD", "CE", "CZ", "NH1"]
    variants = ["SG", "OG", "CG1", "OG1", "SD", "CD1", "OD1", "ND1",
                "NE", "OE1", "NZ"]
    for r in range(n_res):
        atoms = list(full)
        if r % 5 == 1:
            atoms = ["N", "CA", "C"]          # glycine-like
        elif r % 5 == 2:
            atoms = ["N", "CA", "C", "CB", "SG"]  # cysteine-like
        elif r % 5 == 3:
            # variant group members (e.g. OD1 for aspartate)
            atoms = ["N", "CA", "C", "CB", rng.choice(variants)]
        elif r % 5 == 4:
            atoms = ["CA", "C"]               # missing N -> CA fallback
        for a in atoms:
            names.append(a)
            amino_id.append(r * 10 + 3)  # non-contiguous ids (unique/inverse)
            pos.append(rng.normal(0, 5, 3))
    return (np.asarray(names), np.asarray(amino_id, np.int64),
            np.asarray(pos, np.float64))


def test_atom_positions_and_side_chain_value_parity(ref_sgu):
    import torch

    rng = np.random.RandomState(5)
    n_res = 17
    names, amino_id, pos = _synthetic_atoms(rng, n_res)
    ours_pos = G.atom_positions(n_res, names, amino_id, pos)
    ref_out = ref_sgu.get_atom_pos(list(range(n_res)), names, amino_id, pos)
    keys = ("n", "ca", "c", "cb", "g", "d", "e", "z", "h")
    for key, theirs in zip(keys, ref_out):
        np.testing.assert_allclose(
            ours_pos[key], theirs.numpy(), atol=1e-5, equal_nan=True,
            err_msg=f"atom group '{key}' disagrees with reference")

    ours_sc = G.side_chain_embeddings(ours_pos)
    theirs_sc = ref_sgu.calc_side_chain_embs(
        *[torch.tensor(t, dtype=torch.float64) for t in
          (ours_pos["n"], ours_pos["ca"], ours_pos["c"], ours_pos["cb"],
           ours_pos["g"], ours_pos["d"], ours_pos["e"], ours_pos["z"],
           ours_pos["h"])])
    theirs_sc = torch.nan_to_num(theirs_sc).numpy()  # ref :208 NaN->0
    np.testing.assert_allclose(ours_sc, theirs_sc, atol=1e-5)
