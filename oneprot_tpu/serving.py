"""Serving API: load a trained run and embed/retrieve at inference time.

The reference has no serving layer (eval/collect scripts only); this is the
TPU build's production-inference surface: jit-compiled per-(modality, bucket)
embed functions with on-device top-k retrieval.

    embedder = OneProtEmbedder.from_run_dir("logs/train/runs/<stamp>")
    feats = embedder.embed_sequences(["MKTAY...", ...])
    hits = embedder.retrieve(feats, pool_feats, k=10)
"""

from __future__ import annotations

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
        from oneprot_tpu.train.checkpoint import CheckpointManager

        module, cfg = load_trained_module(run_dir)
        module.init_for_restore()
        from oneprot_tpu.train.checkpoint import restore_any

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
            params = self.module.state.params

            self._embed_cache[modality] = jax.jit(
                lambda ids: model.apply({"params": params}, ids, modality))
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

    # ------------------------------------------------------------------
    @staticmethod
    def retrieve(queries: np.ndarray, pool: np.ndarray,
                 k: int = 10) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k cosine retrieval on device (`lax.top_k` over the MXU matmul;
        the reference's FAISS slot — declared but never used, SURVEY §2.2)."""

        def _run(q, p):
            qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True),
                                 1e-12)
            pn = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True),
                                 1e-12)
            sims = qn @ pn.T
            return jax.lax.top_k(sims, k)

        scores, idx = jax.jit(_run)(jnp.asarray(queries), jnp.asarray(pool))
        return np.asarray(scores), np.asarray(idx)
