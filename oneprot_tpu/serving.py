"""Serving API: load a trained run and embed/retrieve at inference time.

The reference has no serving layer (eval/collect scripts only); this is the
TPU build's production-inference surface: jit-compiled per-(modality, bucket)
embed functions with on-device top-k retrieval.

    embedder = OneProtEmbedder.from_run_dir("logs/train/runs/<stamp>")
    feats = embedder.embed_sequences(["MKTAY...", ...])
    hits = embedder.retrieve(feats, pool_feats, k=10)
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from oneprot_tpu.data.common import pick_bucket
from oneprot_tpu.data.tokenizers import (
    esm2_tokenizer,
    resolve_text_tokenizer,
    struct_token_tokenizer,
)
from oneprot_tpu.utils.loggers import get_pylogger

log = get_pylogger(__name__)

DEFAULT_BUCKETS = (64, 128, 256, 512, 1024)


@functools.partial(jax.jit, static_argnums=2)
def _topk_cosine(q, p, k: int):
    # module-level jit: a per-call closure would retrace on every retrieve
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    pn = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
    return jax.lax.top_k(qn @ pn.T, k)


class OneProtEmbedder:
    def __init__(self, module, buckets: Sequence[int] = DEFAULT_BUCKETS,
                 text_vocab: str = "tiny"):
        self.module = module
        self.buckets = list(buckets)
        self.seq_tok = esm2_tokenizer()
        self.struct_tok = struct_token_tokenizer()
        self.text_tok = resolve_text_tokenizer(text_vocab)
        self._embed_cache: Dict[str, any] = {}

    @classmethod
    def from_run_dir(cls, run_dir: str, ckpt: str = "best",
                     **kwargs) -> "OneProtEmbedder":
        from oneprot_tpu.evaluation.retrieval_eval import load_trained_module
        from oneprot_tpu.train.checkpoint import restore_any

        module, cfg = load_trained_module(run_dir)
        module.init_for_restore()

        try:
            # Orbax name/dir or a reference Lightning .ckpt file
            log.info(f"loaded {restore_any(module, run_dir, ckpt)}")
        except FileNotFoundError as e:
            log.warning(f"{e}; random weights")
        buckets = (cfg.get("data", {}) or {}).get("buckets") or DEFAULT_BUCKETS
        text_vocab = str((cfg.get("paths", {}) or {}).get("text_vocab", "tiny"))
        return cls(module, buckets=buckets, text_vocab=text_vocab)

    # ------------------------------------------------------------------
    def _embed_fn(self, modality: str):
        if modality not in self._embed_cache:
            model = self.module.model

            # params flow as a jit ARGUMENT: closing over them would bake
            # the full hub (2.6 GB at 650M-bf16) into the HLO as constants
            # — enormous lowered programs and, through a remote-compile
            # backend, oversized compile payloads (observed HTTP 413)
            jitted = jax.jit(
                lambda p, ids: model.apply({"params": p}, ids, modality))
            params = self.module.state.params
            self._embed_cache[modality] = lambda ids: jitted(params, ids)
        return self._embed_cache[modality]

    def _embed_tokens(self, modality: str, tok, items: Sequence[str],
                      max_length: int = 1024,
                      batch_size: int = 32) -> np.ndarray:
        out = []
        fn = self._embed_fn(modality)
        for start in range(0, len(items), batch_size):
            chunk = list(items[start:start + batch_size])
            pad = pick_bucket(max(len(s) + 2 for s in chunk), self.buckets,
                              max_length)
            ids = jnp.asarray(tok(chunk, max_length=max_length, padding=pad))
            out.append(np.asarray(fn(ids), np.float32))
        return np.concatenate(out, axis=0)

    def embed_sequences(self, sequences: Sequence[str], **kw) -> np.ndarray:
        return self._embed_tokens("sequence", self.seq_tok, sequences, **kw)

    def embed_struct_tokens(self, tdi_strings: Sequence[str], **kw) -> np.ndarray:
        return self._embed_tokens("struct_token", self.struct_tok,
                                  tdi_strings, **kw)

    def embed_texts(self, texts: Sequence[str], max_length: int = 512,
                    batch_size: int = 32) -> np.ndarray:
        return self._embed_tokens("text", self.text_tok, texts,
                                  max_length=max_length,
                                  batch_size=batch_size)

    def embed_graphs(self, h5_path: str, ids: Sequence[str],
                     modality: str = "struct_graph",
                     max_residues: int = 256, max_neighbors: int = 24,
                     batch_size: int = 16) -> np.ndarray:
        """Embed residue graphs (struct_graph) or pocket cut-outs (pocket)
        straight from a `seqstruc.h5`-layout file (the layout
        `scripts/ingest_structures.py` writes from raw PDB/mmCIF). Static
        [max_residues] padding keeps one compile across batches."""
        from oneprot_tpu.data.common import H5
        from oneprot_tpu.data.utils.graphs import (
            protein_to_padded_graph,
            stack_graphs,
        )

        h5 = H5.get(h5_path)
        fn = self._embed_fn(modality)
        out = []
        for start in range(0, len(ids), batch_size):
            graphs = []
            for pid in ids[start:start + batch_size]:
                node = h5[pid]["structure"]["0"]["A"]
                seq = node["residues"]["seq1"][()].decode("utf-8")
                poly = node["polypeptide"]
                graphs.append(protein_to_padded_graph(
                    seq, poly["type"][()], poly["atom_amino_id"][()],
                    np.asarray(poly["xyz"][()], np.float64),
                    max_residues=max_residues,
                    max_neighbors=max_neighbors))
            batch = {k: jnp.asarray(v)
                     for k, v in stack_graphs(graphs).items()}
            out.append(np.asarray(fn(batch), np.float32))
        return np.concatenate(out, axis=0)

    def embed_msas(self, a3m_paths: Sequence[str], msa_depth: int = 16,
                   max_length: int = 1024,
                   batch_size: int = 4) -> np.ndarray:
        """Embed .a3m MSAs: greedy-select `msa_depth` rows (the reference's
        subsampling protocol), pad rows/cols statically, run the MSA
        transformer tower."""
        from oneprot_tpu.data.tokenizers import MsaBatchConverter
        from oneprot_tpu.data.utils.msa_io import greedy_select, read_msa

        converter = MsaBatchConverter()
        fn = self._embed_fn("msa")
        out = []
        for start in range(0, len(a3m_paths), batch_size):
            msas = [greedy_select(read_msa(p), num_seqs=msa_depth)
                    for p in a3m_paths[start:start + batch_size]]
            longest = max(
                (min(len(s), max_length - 2) + 1 for m in msas for _, s in m),
                default=2)
            cols = pick_bucket(longest, self.buckets, max_length)
            tokens = converter(msas, max_rows=msa_depth,
                               pad_rows_to=msa_depth, pad_cols_to=cols)
            out.append(np.asarray(
                fn(jnp.asarray(tokens[:, :, :max_length])), np.float32))
        return np.concatenate(out, axis=0)

    # ------------------------------------------------------------------
    @staticmethod
    def retrieve(queries: np.ndarray, pool: np.ndarray,
                 k: int = 10) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k cosine retrieval on device (`lax.top_k` over the MXU matmul;
        the reference's FAISS slot — declared but never used, SURVEY §2.2).

        For repeated queries against the same pool, `jax.device_put` the
        pool once and pass the device array — a host numpy pool re-uploads
        per call (hundreds of MB at 100k x 1024)."""
        scores, idx = _topk_cosine(jnp.asarray(queries), jnp.asarray(pool), k)
        return np.asarray(scores), np.asarray(idx)
