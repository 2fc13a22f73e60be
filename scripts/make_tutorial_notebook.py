"""Generate notebooks/tutorial_end_to_end.ipynb.

The notebook is the runnable counterpart of docs/TUTORIAL.md (reference:
notebooks/tutorials/Tutorial_CIF_and_PDB_loading.ipynb, which stops at
coordinate arrays — this one continues through training, retrieval eval,
and serving on synthetic data). Regenerate with:

    python scripts/make_tutorial_notebook.py [--execute]

--execute runs every cell on the host CPU backend (8 virtual devices)
and writes the executed outputs into the notebook.
"""

import os
import sys

import nbformat as nbf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MD = []
CODE = []


def md(s):
    MD.append(len(MD) + len(CODE))
    return nbf.v4.new_markdown_cell(s)


def code(s):
    return nbf.v4.new_code_cell(s.strip("\n"))


cells = [
    md("""# OneProt-TPU: raw structures → training → retrieval → serving

The runnable counterpart of `docs/TUTORIAL.md`. Everything below executes
on a plain CPU host (8 virtual devices) in a few minutes; the same code
scales to TPU pods by changing only the config. The reference's
`Tutorial_CIF_and_PDB_loading.ipynb` stops at coordinate arrays — this
walkthrough continues through the whole stack."""),
    code("""
# Hermetic setup: host CPU backend with 8 virtual devices (the "ddp_sim"
# equivalent). On a real TPU host, skip this cell.
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
import pathlib, sys
REPO = pathlib.Path.cwd()
if not (REPO / "oneprot_tpu").exists():
    REPO = REPO.parent  # running from notebooks/
sys.path.insert(0, str(REPO))
import jax
print(jax.devices())
"""),
    md("""## 1. Raw PDB → training-ready dataset

`scripts/ingest_structures.py` wraps first-party PDB/mmCIF parsers (no
BioPython) that write the exact `seqstruc.h5` layout every structure
dataset reads. Here we synthesize a small PDB file and ingest it."""),
    code("""
import numpy as np, tempfile, pathlib
from oneprot_tpu.data.utils.structure_io import ingest_files

work = pathlib.Path(tempfile.mkdtemp(prefix="oneprot_tutorial_"))
rng = np.random.RandomState(0)
lines, serial, base = [], 0, np.zeros(3)
for ri in range(1, 13):
    rname = ["ALA", "GLY", "MET", "VAL"][ri % 4]
    base = base + np.array([3.8, 0.3 * (-1) ** ri, 0.1])
    for aname in ("N", "CA", "C"):
        serial += 1
        x, y, z = base + rng.randn(3) * 0.4
        lines.append(f"ATOM  {serial:5d} {aname:<4s} {rname:>3s} A"
                     f"{ri:4d}    {x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00")
(work / "prot1.pdb").write_text("\\n".join(lines) + "\\n")

ids = ingest_files([str(work / "prot1.pdb")], str(work / "seqstruc.h5"))
(work / "train_seqstruc.csv").write_text("prot1\\n")
print("ingested:", ids)
"""),
    code("""
# The ingested file feeds StructDataset -> padded, statically-shaped graphs
from oneprot_tpu.data.datasets.struct_graph_dataset import StructDataset

ds = StructDataset(str(work), "train", max_residues=16, max_neighbors=4)
seq_input, graph, modality, seqs = ds.collate_fn(["prot1"])
print(modality, "| sequence:", seqs[0])
print({k: tuple(v.shape) for k, v in graph.items()})
"""),
    md("""## 2. Train an all-modalities slice

`generate_fixtures` writes tiny synthetic versions of every file the real
datasets read (HDF5 structures, CSVs, .a3m MSAs); the `debug_all_modalities`
experiment trains all six modality pairs on them. Identical to
`python train.py experiment=debug_all_modalities paths.data_dir=...`."""),
    code("""
from oneprot_tpu.core.config import load_config, prepare_run_dir
from oneprot_tpu.cli.train import train
from oneprot_tpu.data.synthetic import generate_fixtures

data_dir = str(work / "data")
generate_fixtures(data_dir, n_train=8, n_eval=6)
cfg = load_config(str(REPO / "configs"), "train", overrides=[
    "experiment=debug_all_modalities",
    f"paths.data_dir={data_dir}",
    "trainer.limit_train_batches=2", "trainer.limit_val_batches=1",
    "test=False",
])
run_dir = str(work / "run")
cfg = prepare_run_dir(cfg, output_dir=run_dir)
metrics = train(cfg)
print({k: round(float(v), 3) for k, v in metrics.items() if "loss" in k})
"""),
    md("""## 3. Retrieval evaluation

`eval.py` embeds every modality from one combined CSV and computes
R@{1,10,100,500} + median rank in both directions for every modality
pair — the reference's `src/eval.py` protocol."""),
    code("""
import os
from oneprot_tpu.evaluation.retrieval_eval import run_eval

os.environ["ONEPROT_DATA_DIR"] = data_dir
eval_cfg = load_config(str(REPO / "configs"), "eval", overrides=[
    f"run_dir={run_dir}", "batch_size=3",
    f"csv_file={data_dir}/test_all_modalities.csv",
])
eval_cfg = prepare_run_dir(eval_cfg, output_dir=str(work / "eval_out"))
results = run_eval(eval_cfg)
for pair, m in list(results.items())[:3]:
    print(pair, {k: round(float(v), 3) for k, v in m.items()
                 if k.endswith("R@1") or k.endswith("median_rank")})
print("... ->", os.path.join(run_dir, "retrieval_results.csv"))
"""),
    md("""## 4. Serving

`OneProtEmbedder` is the inference surface (the reference has none):
batch embedding for all six modalities plus on-device top-k retrieval."""),
    code("""
from oneprot_tpu.serving import OneProtEmbedder

emb = OneProtEmbedder.from_run_dir(run_dir)
seq_feats = emb.embed_sequences(["MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ",
                                 "MAGWSRLSA"])
pool = jax.device_put(seq_feats)
scores, idx = emb.retrieve(seq_feats[:1], pool, k=2)
print("top-2 neighbours of query 0:", idx[0].tolist(), scores[0].tolist())
"""),
    md("""## 5. Where to go next

- **Scale**: `python train.py experiment=train_pod_packed` (packing +
  frozen-feature cache) or `experiment=train_3b_tp` (ESM2-3B hub,
  tensor-parallel over the mesh's `model` axis).
- **Benchmarks**: `python bench.py` (training hot loop, real chip),
  `python scripts/bench_serving.py`, `python scripts/bench_all_modalities.py`.
- **Downstream probes**: `python collect_embeddings.py`, then
  `python saprot_fit_mlp.py` / `saprot_fit_cls.py` (SaProt protocol).
- `docs/TUTORIAL.md` has the CLI-first version of this walkthrough;
  `docs/ARCHITECTURE.md` the design; `docs/PERFORMANCE.md` the numbers."""),
]

nb = nbf.v4.new_notebook(cells=cells, metadata={
    "kernelspec": {"display_name": "Python 3", "language": "python",
                   "name": "python3"},
    "language_info": {"name": "python"},
})

out = os.path.join(REPO, "notebooks", "tutorial_end_to_end.ipynb")
os.makedirs(os.path.dirname(out), exist_ok=True)

if "--execute" in sys.argv:
    from nbclient import NotebookClient

    NotebookClient(nb, timeout=1200,
                   resources={"metadata": {"path": REPO}}).execute()

with open(out, "w") as f:
    nbf.write(nb, f)
print("wrote", out)
