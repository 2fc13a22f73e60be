"""OneProtModule: the jit-compiled training core.

TPU-native equivalent of the reference's `OneProtLitModule`
(reference src/models/oneprot_module.py): holds the encoder dict, loss
config, optimizer, and exposes per-modality train/eval steps.

Design (SURVEY §7.5): the reference's Lightning manual-optimization inner
loop — per modality: seq fwd, mod fwd, loss, zero_grad, backward, clip(1.0),
Adam step (oneprot_module.py:92-107) — becomes ONE jit-compiled function per
(modality, bucket-shape), each a full fwd+bwd+update. The optimizer steps K
times per combined batch, exactly like the reference (this matters for
optimization dynamics, SURVEY §7 hard-part 3).

Parallelism is GSPMD: the step is jitted with the batch sharded over the
mesh's "data" axis and params replicated; XLA partitions the contrastive
`features @ features.T` into the all-gather + local-logits pattern
automatically (the explicit-collective implementations in
oneprot_tpu/losses/ are the semantic spec, tested under shard_map).

Frozen backbones are *partitioned out of differentiation*: jax.grad runs
only over the trainable subtree, so the frozen ESM2-650M hub costs a forward
pass only — no backward, no optimizer state.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from oneprot_tpu.core import mesh as mesh_lib
from oneprot_tpu.losses import clip_loss, siglip_loss
from oneprot_tpu.models.encoders import OneProtModel
from oneprot_tpu.train import optim as optim_lib


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any            # full tree (trainable + frozen merged)
    opt_state: Any


def _graft(target: Any, source: Any) -> Any:
    """Overlay `source` values onto `target`, keeping target-only leaves and
    casting to the target leaf dtype."""
    if isinstance(target, dict):
        out = {}
        for k, v in target.items():
            if isinstance(source, dict) and k in source:
                out[k] = _graft(v, source[k])
            else:
                out[k] = v
        return out
    arr = jnp.asarray(source)
    if arr.shape != target.shape:
        raise ValueError(
            f"pretrained shape {arr.shape} != model shape {target.shape}")
    return arr.astype(target.dtype)


class OneProtModule:
    def __init__(
        self,
        components: Dict[str, Any],
        optimizer: Optional[Callable] = None,
        scheduler: Optional[Any] = None,
        loss_fn: str = "CLIP",
        local_loss: bool = True,
        gather_with_grad: bool = True,
        use_l1_regularization: bool = False,
        use_seqsim: bool = False,
        train_on_all_modalities_after_step: int = 0,
        gradient_clip_val: float = 1.0,
        mesh: Optional[Any] = None,
        seed: int = 0,
        frozen_param_dtype: Optional[str] = "bfloat16",
    ):
        self.encoders = dict(components)
        self.model = OneProtModel(encoders=self.encoders)
        self.loss_name = loss_fn
        self.local_loss = local_loss
        self.gather_with_grad = gather_with_grad
        self.use_l1_regularization = use_l1_regularization
        self.use_seqsim = use_seqsim
        self.train_on_all_modalities_after_step = int(
            train_on_all_modalities_after_step)
        self.gradient_clip_val = gradient_clip_val
        self.optimizer_fn = optimizer
        self.scheduler_cfg = scheduler
        self.seed = seed
        self.mesh = mesh
        self.frozen_param_dtype = frozen_param_dtype

        self.tx = optim_lib.build_optimizer(
            optimizer, gradient_clip_val=gradient_clip_val)

        self._train_step_cache: Dict[Any, Callable] = {}
        self._eval_step_cache: Dict[Any, Callable] = {}
        self.state: Optional[TrainState] = None
        self.mask = None

    # -- setup --------------------------------------------------------------

    @property
    def modalities(self):
        return list(self.encoders.keys())

    def init(self, example_batches: Dict[str, Any]) -> TrainState:
        """Initialize params from one example batch per modality.

        The whole init — flax param init, the frozen-leaf bf16 cast, and
        `tx.init` — runs as ONE jitted executable: op-by-op init dispatched
        ~10^3 tiny RPCs through a tunneled backend (~3 min for the 650M
        hub); one compiled program initializes on-device in seconds and the
        executable lands in the persistent compilation cache, so warm
        starts skip its compile too.
        """
        rng = jax.random.key(self.seed)
        examples = {}
        for name, (seq_inputs, mod_inputs) in example_batches.items():
            examples.setdefault("sequence", jax.tree.map(jnp.asarray, seq_inputs))
            if name == "seqsim":
                continue  # routes through 'sequence'
            examples[name] = jax.tree.map(jnp.asarray, mod_inputs)
        if not examples:
            raise ValueError(
                "No example batches provided — did every dataset fail to "
                "load? Check data_dir and the datamodule setup logs.")
        rngs = {"params": rng, "dropout": jax.random.key(self.seed + 1),
                "augment": jax.random.key(self.seed + 2)}

        def raw_init(rngs_, examples_):
            return self.model.init(
                rngs_, examples_, method=OneProtModel.encode_all)["params"]

        abstract_params = jax.eval_shape(raw_init, rngs, examples)
        self.mask = optim_lib.trainable_mask(abstract_params, self.encoders)
        mask = self.mask

        def finish(params):
            if self.frozen_param_dtype in ("bfloat16", "bf16"):
                # frozen leaves never meet an optimizer: store them bf16.
                # Halves the 650M hub's HBM footprint and removes a per-step
                # fp32->bf16 convert of the whole tower (compute dtype is
                # bf16 anyway). int8 kernels (not floating) and int8 dequant
                # scales (`kernel_scale`: bf16's 8 mantissa bits would add
                # ~0.4% dequantization error on top of the quantization
                # noise) keep their dtypes.
                params = jax.tree_util.tree_map_with_path(
                    lambda path, p, trainable_leaf: p
                    if (trainable_leaf
                        or not jnp.issubdtype(p.dtype, jnp.floating)
                        or any(getattr(k, "key", None) == "kernel_scale"
                               for k in path))
                    else p.astype(jnp.bfloat16),
                    params, mask)
            trainable, _ = optim_lib.partition_params(params, mask)
            opt_state = self.tx.init(trainable)
            return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                              opt_state=opt_state)

        # jit out_shardings: params and optimizer moments follow the TP
        # rules when the mesh has a model axis; everything else replicates
        out_shardings = None
        if self.mesh is not None:
            from oneprot_tpu.core.partitioning import abstract_placed

            abstract_state = jax.eval_shape(finish, abstract_params)
            out_shardings = jax.tree.map(
                lambda s: s.sharding,
                abstract_placed(abstract_state, self.mesh))

        has_pretrained = any(
            getattr(enc, "pretrained_dir", None)
            for enc in self.encoders.values())
        if has_pretrained:
            # HF-checkpoint grafting happens host-side (torch state dict →
            # numpy), so params materialize on host anyway; only the
            # post-graft transform runs as one program.
            params = jax.jit(raw_init)(rngs, examples)
            params = self._load_pretrained(params)
            state = jax.jit(finish, out_shardings=out_shardings)(params)
        else:
            state = jax.jit(
                lambda r, ex: finish(raw_init(r, ex)),
                out_shardings=out_shardings)(rngs, examples)

        if self.mesh is not None:
            from oneprot_tpu import kernels as kernels_lib

            kernels_lib.set_active_mesh(self.mesh)
        else:
            # clear any previous module's mesh/platform: a mesh-less module
            # initialized after a meshed one (sweep trials, tests, serving
            # after training) must not inherit a stale shard_map wrapper or
            # kernel-dispatch platform
            from oneprot_tpu import kernels as kernels_lib

            kernels_lib.set_active_mesh(None)
        self.state = state
        return state

    def dummy_examples(self) -> Dict[str, Any]:
        """Minimal per-modality example inputs covering every encoder —
        for rebuilding the full param template at restore time (eval/serving)
        without real data."""
        from oneprot_tpu.models import encoders as enc_lib

        ids = np.full((1, 8), 1, np.int32)
        ids[:, 0] = 0
        examples: Dict[str, Any] = {}
        for name, enc in self.encoders.items():
            if isinstance(enc, enc_lib.StructGraphEncoder):
                n = 8
                k = 4
                examples[name] = (ids, {
                    "aa": np.zeros((1, n), np.int32),
                    "coords_ca": np.zeros((1, n, 3), np.float32),
                    "coords_n": np.zeros((1, n, 3), np.float32),
                    "coords_c": np.zeros((1, n, 3), np.float32),
                    "bb_embs": np.zeros((1, n, 6), np.float32),
                    "side_chain_embs": np.zeros((1, n, 8), np.float32),
                    "node_mask": np.ones((1, n), np.float32),
                    "neighbor_idx": np.zeros((1, n, k), np.int32),
                    "neighbor_mask": np.ones((1, n, k), np.float32),
                })
            elif isinstance(enc, enc_lib.MsaEncoder):
                examples[name] = (ids, np.full((1, 2, 8), 1, np.int32))
            else:
                examples[name] = (ids, ids)
        return examples

    def init_for_restore(self) -> TrainState:
        """Initialize the full param/opt template (all encoders) so an Orbax
        checkpoint of a training run restores structurally."""
        return self.init(self.dummy_examples())

    def _load_pretrained(self, params):
        """Replace transformer subtrees with converted HF weights for any
        encoder constructed from a local checkpoint dir (the reference's
        AutoModel.from_pretrained path, sequence_encoder.py:50-55)."""
        from oneprot_tpu.models import encoders as enc_lib
        from oneprot_tpu.models.hf_convert import (
            convert_bert_state_dict,
            convert_esm2_state_dict,
            load_torch_state_dict,
        )

        for name, enc in self.encoders.items():
            hf_dir = getattr(enc, "pretrained_dir", None)
            if not hf_dir:
                continue
            key = f"encoders_{name}"
            if key not in params or "transformer" not in params[key]:
                continue
            sd = load_torch_state_dict(hf_dir)
            float_tree = None
            if isinstance(enc, (enc_lib.SequenceEncoder,
                                enc_lib.StructTokenEncoder)):
                extra = enc.config.vocab_size - 33
                converted = convert_esm2_state_dict(
                    sd, enc.config.num_layers,
                    extra_vocab_rows=max(extra, 0), seed=self.seed)
                if getattr(enc, "quant_int8", False):
                    # one-time weight quantization into the Int8Dense layout
                    from oneprot_tpu.models.esm2 import quantize_esm2_int8_tree

                    float_tree = converted
                    converted = quantize_esm2_int8_tree(converted)
            elif isinstance(enc, enc_lib.TextEncoder):
                converted = convert_bert_state_dict(sd, enc.config.num_layers)
            else:
                continue
            # keep randomly-initialized leaves the checkpoint doesn't cover
            # (LoRA factors) and preserve shapes/dtypes
            target = params[key]["transformer"]
            params[key]["transformer"] = _graft(target, converted)
            if float_tree is not None and os.environ.get(
                    "ONEPROT_INT8_CANARY", "1") != "0":
                self._int8_canary(name, enc, params[key], float_tree)
        return params

    # Swiss-Prot amino-acid frequencies (%) in ESM2 alphabet order for
    # token ids 4..23 (L A G V S E R T I D P K Q N F Y M H W C): the
    # canary's probe must look like real protein input — quantization
    # damage is token-distribution- and length-sensitive (VERDICT r4 #6)
    _ESM2_AA_FREQ = np.array([
        9.66, 8.25, 7.07, 6.87, 6.56, 6.75, 5.53, 5.34, 5.96, 5.45,
        4.70, 5.84, 3.93, 4.06, 3.86, 2.92, 2.42, 2.27, 1.08, 1.38])

    def _canary_probe_ids(self, vocab_size: int) -> np.ndarray:
        """Realistic probe batch: >=16 rows of Swiss-Prot-frequency amino
        acids with true lengths log-spaced across the production length
        buckets (32..ONEPROT_INT8_CANARY_LEN, default 512), cls/eos
        framed, pad-token tailed (pooling masks pads)."""
        rows = max(int(os.environ.get("ONEPROT_INT8_CANARY_ROWS", "16")), 2)
        max_len = max(
            int(os.environ.get("ONEPROT_INT8_CANARY_LEN", "512")), 16)
        probe_rng = np.random.RandomState(0)
        lens = np.round(
            np.geomspace(min(32, max_len), max_len, rows)).astype(int)
        if vocab_size >= 24:
            p = self._ESM2_AA_FREQ / self._ESM2_AA_FREQ.sum()
            aa = probe_rng.choice(np.arange(4, 24, dtype=np.int32),
                                  size=(rows, max_len), p=p)
        else:  # tiny test vocabs
            aa = probe_rng.randint(4, vocab_size, size=(rows, max_len))
        ids = np.full((rows, max_len), 1, np.int32)  # pad
        for i, li in enumerate(lens):
            ids[i, 0] = 0  # cls
            ids[i, 1:li - 1] = aa[i, 1:li - 1]
            ids[i, li - 1] = 2  # eos
        return ids

    def _int8_canary(self, name: str, enc, enc_params, float_tree) -> None:
        """Runtime quality canary for int8-quantized pretrained hubs
        (VERDICT r3 #8): the int8 path's offline quality evidence comes
        from random towers only — real trained weight distributions
        (heavy tails, outlier channels) can quantize worse. On every
        pretrained int8 load, compare the quantized backbone's pooled
        embeddings against the bf16 weights on a realistic probe batch
        (_canary_probe_ids) and WARN below ONEPROT_INT8_CANARY_MIN cosine
        (default 0.98) or below ONEPROT_INT8_CANARY_R1 (default 1.0)
        bf16<->int8 cross-retrieval R@1 — the retrieval check catches
        damage that preserves per-row cosine but reorders neighborhoods
        (VERDICT r4 #6)."""
        from oneprot_tpu.utils.loggers import get_pylogger

        log = get_pylogger("int8_canary")
        try:
            threshold = float(
                os.environ.get("ONEPROT_INT8_CANARY_MIN", "0.98"))
            r1_threshold = float(
                os.environ.get("ONEPROT_INT8_CANARY_R1", "1.0"))
            ids = jnp.asarray(self._canary_probe_ids(enc.config.vocab_size))

            enc_bf = enc.clone(quant_int8=False)
            target_bf = jax.eval_shape(
                lambda: enc_bf.init(jax.random.key(0), ids))["params"]
            bf_transformer = _graft(target_bf["transformer"], float_tree)
            leaves = jax.tree.leaves(bf_transformer)
            if any(isinstance(x, jax.ShapeDtypeStruct) for x in leaves):
                log.warning(
                    f"int8 canary for '{name}' skipped: float checkpoint "
                    "does not cover every transformer leaf")
                return
            params_bf = dict(enc_params)
            params_bf["transformer"] = bf_transformer

            def pooled(e, p):
                return e.apply({"params": p}, ids,
                               method=type(e).backbone_pooled)

            f_q = np.asarray(jax.jit(
                lambda p: pooled(enc, p))(enc_params), np.float32)
            f_b = np.asarray(jax.jit(
                lambda p: pooled(enc_bf, p))(params_bf), np.float32)
            # Center across probe rows before comparing: a large component
            # SHARED by all rows (e.g. a residual-stream outlier channel)
            # dominates raw cosine and masks damage in the informative
            # dimensions — measured: a checkpoint with a 20x bias outlier
            # reads raw cosine 1.0000 while the centered metrics still
            # resolve its (small) true error. Retrieval quality depends on
            # differences BETWEEN rows, which is what centering isolates.
            cq = f_q - f_q.mean(0)
            cb = f_b - f_b.mean(0)
            num = (cq * cb).sum(-1)
            den = (np.linalg.norm(cq, axis=-1)
                   * np.linalg.norm(cb, axis=-1) + 1e-12)
            cos = num / den
            # cross-retrieval R@1 between the two embedding spaces: each
            # int8 row's nearest bf16 row must be its own (both directions)
            fq = cq / (np.linalg.norm(cq, axis=-1, keepdims=True) + 1e-12)
            fb = cb / (np.linalg.norm(cb, axis=-1, keepdims=True) + 1e-12)
            sim = fq @ fb.T
            n = sim.shape[0]
            r1 = 0.5 * (float((sim.argmax(1) == np.arange(n)).mean())
                        + float((sim.argmax(0) == np.arange(n)).mean()))
            msg = (f"int8 canary '{name}': bf16-vs-int8 pooled-embedding "
                   f"centered cosine min={cos.min():.4f} "
                   f"mean={cos.mean():.4f} (threshold {threshold}), "
                   f"cross-retrieval R@1={r1:.4f} over {n} rows "
                   f"(threshold {r1_threshold})")
            if cos.min() < threshold or r1 < r1_threshold:
                log.warning(
                    msg + " — int8 quantization degrades this checkpoint's "
                    "embeddings; re-run with model.components."
                    f"{name}.quantize=null and compare retrieval quality")
            else:
                log.info(msg)
        except Exception as e:  # the canary must never block a load
            log.warning(f"int8 canary for '{name}' failed (non-fatal): {e}")

    # -- loss ---------------------------------------------------------------

    def _loss_value(self, mod_feats, seq_feats):
        if self.loss_name.upper() == "CLIP":
            loss = clip_loss(mod_feats, seq_feats)
        else:
            loss = self._siglip_value(mod_feats, seq_feats)
        if self.use_l1_regularization:
            # reference oneprot_module.py:99-101
            loss = loss + 0.01 * (
                jnp.mean(jnp.abs(seq_feats)) + jnp.mean(jnp.abs(mod_feats)))
        return loss

    def _siglip_value(self, mod_feats, seq_feats):
        """SigLIP through its production comm path: under a multi-device
        mesh the ppermute negative ring runs inside shard_map over the data
        axis — the actual collective schedule, not a GSPMD choice
        (reference's NCCL neighbour ring, loss.py:260-309). Falls back to
        the dense single-shard form for replicated (tail) batches."""
        dp = self.mesh.shape[mesh_lib.DATA_AXIS] if self.mesh is not None else 1
        if dp > 1 and mod_feats.shape[0] % dp == 0:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            spec = P(mesh_lib.DATA_AXIS, None)
            return shard_map(
                lambda m, s: siglip_loss(m, s,
                                         axis_name=mesh_lib.DATA_AXIS),
                mesh=self.mesh, in_specs=(spec, spec), out_specs=P(),
                check_vma=False,
            )(mod_feats, seq_feats)
        return siglip_loss(mod_feats, seq_feats)

    def _packed_loss_value(self, mod_feats, seq_feats, valid):
        """Loss over a PACKED batch ([R*P, d] features with empty pack
        slots flagged by `valid`): CLIP -> clip_loss_masked, SIGLIP ->
        siglip_loss_masked (VERDICT r2 #3), + the masked L1 regularizer
        (reference oneprot_module.py:99-101 restricted to real pairs)."""
        from oneprot_tpu.losses import clip_loss_masked

        if self.loss_name.upper() == "CLIP":
            loss = clip_loss_masked(mod_feats, seq_feats, valid)
        else:
            loss = self._siglip_value_masked(mod_feats, seq_feats, valid)
        if self.use_l1_regularization:
            v = valid.astype(jnp.float32)[:, None]
            n = jnp.maximum(v.sum(), 1.0) * seq_feats.shape[-1]
            loss = loss + 0.01 * (
                jnp.sum(jnp.abs(seq_feats) * v) / n
                + jnp.sum(jnp.abs(mod_feats) * v) / n)
        return loss

    def _siglip_value_masked(self, mod_feats, seq_feats, valid):
        """Masked SigLIP through the same production comm path as
        _siglip_value: the ppermute negative ring runs inside shard_map
        over the data axis, carrying each shard's valid-slot mask with its
        features."""
        from oneprot_tpu.losses import siglip_loss_masked

        dp = self.mesh.shape[mesh_lib.DATA_AXIS] if self.mesh is not None else 1
        if dp > 1 and mod_feats.shape[0] % dp == 0:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            spec = P(mesh_lib.DATA_AXIS, None)
            return shard_map(
                lambda m, s, v: siglip_loss_masked(
                    m, s, v, axis_name=mesh_lib.DATA_AXIS),
                mesh=self.mesh,
                in_specs=(spec, spec, P(mesh_lib.DATA_AXIS)),
                out_specs=P(), check_vma=False,
            )(mod_feats, seq_feats, valid)
        return siglip_loss_masked(mod_feats, seq_feats, valid)

    def _forward_pair(self, params, modality, seq_inputs, mod_inputs,
                      rngs=None, deterministic=True):
        seq_feats = self.model.apply(
            {"params": params}, seq_inputs, "sequence",
            deterministic=deterministic, rngs=rngs)
        mod_feats = self.model.apply(
            {"params": params}, mod_inputs, modality,
            deterministic=deterministic, rngs=rngs)
        return seq_feats, mod_feats

    # -- train step ----------------------------------------------------------

    def train_step_fn(self, modality: str):
        """The raw (un-jitted) train step for `modality` — used by the jit
        wrapper below and by callers that fuse several steps into one
        dispatch (bench.py scans it to amortize dispatch latency)."""
        mask = self.mask
        tx = self.tx

        def step_fn(state: TrainState, seq_inputs, mod_inputs):
            rng = jax.random.fold_in(jax.random.key(self.seed), state.step)
            rngs = {"dropout": rng, "augment": jax.random.fold_in(rng, 1)}
            trainable, frozen = optim_lib.partition_params(state.params, mask)

            def loss_fn(trainable_params):
                params = optim_lib.merge_params(trainable_params, frozen)
                seq_feats, mod_feats = self._forward_pair(
                    params, modality, seq_inputs, mod_inputs,
                    rngs=rngs, deterministic=False)
                return self._loss_value(mod_feats, seq_feats)

            loss, grads = jax.value_and_grad(loss_fn)(trainable)
            updates, new_opt = tx.update(grads, state.opt_state, trainable)
            new_trainable = optax.apply_updates(trainable, updates)
            new_params = optim_lib.merge_params(new_trainable, frozen)
            return TrainState(step=state.step + 1, params=new_params,
                              opt_state=new_opt), loss

        return step_fn

    def _build_train_step(self, modality: str):
        step_fn = self.train_step_fn(modality)
        donate = (0,)
        if self.mesh is not None:
            from oneprot_tpu.core.partitioning import state_shardings

            return jax.jit(
                step_fn,
                donate_argnums=donate,
                out_shardings=(state_shardings(self.state),
                               NamedSharding(self.mesh, P())),
            )
        return jax.jit(step_fn, donate_argnums=donate)

    def train_step(self, state: TrainState, modality: str,
                   seq_inputs, mod_inputs) -> Tuple[TrainState, jax.Array]:
        if modality not in self._train_step_cache:
            self._train_step_cache[modality] = self._build_train_step(modality)
        seq_inputs, mod_inputs = self._shard_batch(seq_inputs, mod_inputs)
        return self._train_step_cache[modality](state, seq_inputs, mod_inputs)

    # -- frozen-feature cache path -------------------------------------------
    #
    # The hub encoder is frozen in the reference's production config
    # (reference configs/model/components/sequence.yaml: frozen: true,
    # use_lora: false), so its transformer+pooling output for a given
    # tokenized input never changes during training. From the second pass
    # over the data, the 650M forward (~2/3 of the step) is pure recompute:
    # the trainer caches the pooled [B, d_model] representation per sample
    # and trains through head_from_pooled instead. Numerics are bit-equal
    # to the uncached step (tests/test_feature_cache.py).

    def hub_is_cacheable(self) -> bool:
        enc = self.encoders.get("sequence")
        return bool(getattr(enc, "backbone_is_cacheable", False))

    def modality_is_cacheable(self, modality: str) -> bool:
        """True when the MODALITY tower's backbone output is constant
        (frozen text/MSA towers; seqsim routes to the frozen hub)."""
        if modality in ("sequence", "seqsim"):
            return self.hub_is_cacheable()
        enc = self.encoders.get(modality)
        return bool(getattr(enc, "backbone_is_cacheable", False))

    def encode_pooled(self, params, modality: str, inputs) -> jax.Array:
        """Jitted frozen-backbone forward: transformer -> pooled [B, d]."""
        self._activate_kernels()
        key = ("pooled", modality)
        if key not in self._eval_step_cache:
            self._eval_step_cache[key] = jax.jit(
                lambda p, x: self.model.apply(
                    {"params": p}, x, modality,
                    method=OneProtModel.encode_pooled))
        return self._eval_step_cache[key](params, jnp.asarray(inputs))

    def encode_packed_pooled(self, params, modality: str, ids, segment_ids,
                             num_segments: int) -> jax.Array:
        """Jitted frozen-backbone forward over a PACKED batch:
        segment-masked transformer -> per-protein pooled [R*P, d] (the
        frozen-cacheable representation; feature_cache.get_pooled_packed)."""
        self._activate_kernels()
        key = ("packed_pooled", modality, num_segments)
        if key not in self._eval_step_cache:
            self._eval_step_cache[key] = jax.jit(
                lambda p, i, s: self.model.apply(
                    {"params": p}, i, s, num_segments, modality,
                    method=OneProtModel.encode_packed_pooled)[0])
        return self._eval_step_cache[key](
            params, jnp.asarray(ids), jnp.asarray(segment_ids))

    def train_step_cached_fn(self, modality: str):
        """Raw (un-jitted) cached train step (see train_step_fn)."""
        mask = self.mask
        tx = self.tx

        def step_fn(state: TrainState, seq_pooled, mod_inputs):
            rng = jax.random.fold_in(jax.random.key(self.seed), state.step)
            rngs = {"dropout": rng, "augment": jax.random.fold_in(rng, 1)}
            trainable, frozen = optim_lib.partition_params(state.params, mask)

            def loss_fn(trainable_params):
                params = optim_lib.merge_params(trainable_params, frozen)
                seq_feats = self.model.apply(
                    {"params": params}, seq_pooled, "sequence",
                    method=OneProtModel.head_from_pooled)
                mod_feats = self.model.apply(
                    {"params": params}, mod_inputs, modality,
                    deterministic=False, rngs=rngs)
                return self._loss_value(mod_feats, seq_feats)

            loss, grads = jax.value_and_grad(loss_fn)(trainable)
            updates, new_opt = tx.update(grads, state.opt_state, trainable)
            new_trainable = optax.apply_updates(trainable, updates)
            new_params = optim_lib.merge_params(new_trainable, frozen)
            return TrainState(step=state.step + 1, params=new_params,
                              opt_state=new_opt), loss

        return step_fn

    def _build_train_step_cached(self, modality: str):
        step_fn = self.train_step_cached_fn(modality)
        donate = (0,)
        if self.mesh is not None:
            from oneprot_tpu.core.partitioning import state_shardings

            return jax.jit(
                step_fn,
                donate_argnums=donate,
                out_shardings=(state_shardings(self.state),
                               NamedSharding(self.mesh, P())),
            )
        return jax.jit(step_fn, donate_argnums=donate)

    def train_step_cached(self, state: TrainState, modality: str,
                          seq_pooled, mod_inputs):
        """Train step consuming a cached pooled hub representation."""
        key = ("cached", modality)
        if key not in self._train_step_cache:
            self._train_step_cache[key] = self._build_train_step_cached(
                modality)
        seq_pooled, mod_inputs = self._shard_batch(seq_pooled, mod_inputs)
        return self._train_step_cache[key](state, seq_pooled, mod_inputs)

    def train_step_packed_fn(self, modality: str, num_segments: int):
        """Raw train step over PACKED batches (sequence packing,
        data/packing.py): both towers run segment-masked attention over
        rows holding several proteins each, pool per segment, and the CLIP
        loss runs over the unpacked per-protein features with empty pack
        slots masked (clip_loss_masked / siglip_loss_masked per the
        configured loss). Token encoders only (sequence/seqsim <->
        struct_token/text; the text tower packs with per-segment absolute
        positions + segment CLS pooling, models/bert.py)."""
        mask = self.mask
        tx = self.tx

        def step_fn(state: TrainState, seq_ids, seq_seg, mod_ids, mod_seg,
                    valid):
            # dropout rngs + deterministic=False so LoRA dropout (the only
            # dropout in these towers) applies under packing exactly like
            # the unpacked step — it was silently disabled before
            rng = jax.random.fold_in(jax.random.key(self.seed), state.step)
            rngs = {"dropout": rng}
            trainable, frozen = optim_lib.partition_params(state.params, mask)

            def loss_fn(trainable_params):
                params = optim_lib.merge_params(trainable_params, frozen)
                seq_feats, _ = self.model.apply(
                    {"params": params}, seq_ids, seq_seg, num_segments,
                    "sequence", deterministic=False, rngs=rngs,
                    method=OneProtModel.encode_packed)
                mod_feats, _ = self.model.apply(
                    {"params": params}, mod_ids, mod_seg, num_segments,
                    modality, deterministic=False, rngs=rngs,
                    method=OneProtModel.encode_packed)
                return self._packed_loss_value(mod_feats, seq_feats, valid)

            loss, grads = jax.value_and_grad(loss_fn)(trainable)
            updates, new_opt = tx.update(grads, state.opt_state, trainable)
            new_trainable = optax.apply_updates(trainable, updates)
            new_params = optim_lib.merge_params(new_trainable, frozen)
            return TrainState(step=state.step + 1, params=new_params,
                              opt_state=new_opt), loss

        return step_fn

    def train_step_packed_cached_fn(self, modality: str, num_segments: int):
        """Packed step in the frozen-feature-cache steady state: the hub's
        pooled per-protein representations come from the cache (aligned to
        pack slots, [R*P, d_model]); only the trainable MODALITY tower runs
        packed. Combines the two big levers — packing and the cache."""
        mask = self.mask
        tx = self.tx

        def step_fn(state: TrainState, seq_pooled, mod_ids, mod_seg, valid):
            rng = jax.random.fold_in(jax.random.key(self.seed), state.step)
            rngs = {"dropout": rng}
            trainable, frozen = optim_lib.partition_params(state.params, mask)

            def loss_fn(trainable_params):
                params = optim_lib.merge_params(trainable_params, frozen)
                seq_feats = self.model.apply(
                    {"params": params}, seq_pooled, "sequence",
                    method=OneProtModel.head_from_pooled)
                mod_feats, _ = self.model.apply(
                    {"params": params}, mod_ids, mod_seg, num_segments,
                    modality, deterministic=False, rngs=rngs,
                    method=OneProtModel.encode_packed)
                return self._packed_loss_value(mod_feats, seq_feats, valid)

            loss, grads = jax.value_and_grad(loss_fn)(trainable)
            updates, new_opt = tx.update(grads, state.opt_state, trainable)
            new_trainable = optax.apply_updates(trainable, updates)
            new_params = optim_lib.merge_params(new_trainable, frozen)
            return TrainState(step=state.step + 1, params=new_params,
                              opt_state=new_opt), loss

        return step_fn

    def train_step_packed(self, state: TrainState, modality: str,
                          seq_pack, mod_pack, valid):
        """Jitted packed train step (sequence packing — see
        train_step_packed_fn). seq_pack/mod_pack: {"ids": [R, L],
        "segment_ids": [R, L]}; valid: [R, P]."""
        valid = np.asarray(valid)
        p_slots = valid.shape[1]
        key = ("packed", modality, p_slots)
        if key not in self._train_step_cache:
            step_fn = self.train_step_packed_fn(modality, p_slots)
            donate = (0,)
            if self.mesh is not None:
                from oneprot_tpu.core.partitioning import state_shardings

                self._train_step_cache[key] = jax.jit(
                    step_fn, donate_argnums=donate,
                    out_shardings=(state_shardings(self.state),
                                   NamedSharding(self.mesh, P())))
            else:
                self._train_step_cache[key] = jax.jit(
                    step_fn, donate_argnums=donate)
        seq_in, mod_in = self._shard_batch(
            (seq_pack["ids"], seq_pack["segment_ids"]),
            (mod_pack["ids"], mod_pack["segment_ids"]))
        (valid_flat,), _ = self._shard_batch((valid.reshape(-1),), ())
        return self._train_step_cache[key](
            state, seq_in[0], seq_in[1], mod_in[0], mod_in[1], valid_flat)

    def train_step_packed_cached(self, state: TrainState, modality: str,
                                 seq_pooled, mod_pack, valid):
        """Jitted packed+cached train step: cached hub pooled features
        (slot-aligned [R*P, d] from feature_cache.get_pooled_packed) +
        the trainable modality tower running packed. The production
        steady state from epoch 2 (VERDICT r2 #2): combines the packing
        win (no padding) with the cache win (no frozen-hub forward)."""
        valid = np.asarray(valid)
        p_slots = valid.shape[1]
        key = ("packed_cached", modality, p_slots)
        if key not in self._train_step_cache:
            step_fn = self.train_step_packed_cached_fn(modality, p_slots)
            donate = (0,)
            if self.mesh is not None:
                from oneprot_tpu.core.partitioning import state_shardings

                self._train_step_cache[key] = jax.jit(
                    step_fn, donate_argnums=donate,
                    out_shardings=(state_shardings(self.state),
                                   NamedSharding(self.mesh, P())))
            else:
                self._train_step_cache[key] = jax.jit(
                    step_fn, donate_argnums=donate)
        # seq_pooled is [R*P, d] and the modality side [R, L]: sharding
        # both on the leading axis keeps row r's P slots on the same data
        # shard as row r's tokens
        seq_in, mod_in = self._shard_batch(
            (seq_pooled,), (mod_pack["ids"], mod_pack["segment_ids"]))
        (valid_flat,), _ = self._shard_batch((valid.reshape(-1),), ())
        return self._train_step_cache[key](
            state, seq_in[0], mod_in[0], mod_in[1], valid_flat)

    def train_step_fully_cached_fn(self, modality: str):
        """Raw step where BOTH towers' backbones are cached (frozen hub +
        frozen modality tower, e.g. seq<->text / seq<->msa / seqsim):
        only the two heads run."""
        mask = self.mask
        tx = self.tx

        def step_fn(state: TrainState, seq_pooled, mod_pooled):
            trainable, frozen = optim_lib.partition_params(state.params, mask)

            def loss_fn(trainable_params):
                params = optim_lib.merge_params(trainable_params, frozen)
                seq_feats = self.model.apply(
                    {"params": params}, seq_pooled, "sequence",
                    method=OneProtModel.head_from_pooled)
                mod_feats = self.model.apply(
                    {"params": params}, mod_pooled, modality,
                    method=OneProtModel.head_from_pooled)
                return self._loss_value(mod_feats, seq_feats)

            loss, grads = jax.value_and_grad(loss_fn)(trainable)
            updates, new_opt = tx.update(grads, state.opt_state, trainable)
            new_trainable = optax.apply_updates(trainable, updates)
            new_params = optim_lib.merge_params(new_trainable, frozen)
            return TrainState(step=state.step + 1, params=new_params,
                              opt_state=new_opt), loss

        return step_fn

    def train_step_fully_cached(self, state: TrainState, modality: str,
                                seq_pooled, mod_pooled):
        key = ("cached2", modality)
        if key not in self._train_step_cache:
            step_fn = self.train_step_fully_cached_fn(modality)
            donate = (0,)
            if self.mesh is not None:
                from oneprot_tpu.core.partitioning import state_shardings

                self._train_step_cache[key] = jax.jit(
                    step_fn, donate_argnums=donate,
                    out_shardings=(state_shardings(self.state),
                                   NamedSharding(self.mesh, P())))
            else:
                self._train_step_cache[key] = jax.jit(
                    step_fn, donate_argnums=donate)
        seq_pooled, mod_pooled = self._shard_batch(seq_pooled, mod_pooled)
        return self._train_step_cache[key](state, seq_pooled, mod_pooled)

    def eval_step_fully_cached(self, params, modality: str, seq_pooled,
                               mod_pooled):
        key = ("eval_cached2", modality)
        if key not in self._eval_step_cache:
            def step_fn(params, seq_pooled, mod_pooled):
                seq_feats = self.model.apply(
                    {"params": params}, seq_pooled, "sequence",
                    method=OneProtModel.head_from_pooled)
                mod_feats = self.model.apply(
                    {"params": params}, mod_pooled, modality,
                    method=OneProtModel.head_from_pooled)
                loss = self._loss_value(mod_feats, seq_feats)
                return seq_feats, mod_feats, loss

            self._eval_step_cache[key] = jax.jit(step_fn)
        seq_pooled, mod_pooled = self._shard_batch(seq_pooled, mod_pooled)
        return self._eval_step_cache[key](params, seq_pooled, mod_pooled)

    # -- eval step ------------------------------------------------------------

    def _build_eval_step(self, modality: str):
        def step_fn(params, seq_inputs, mod_inputs):
            seq_feats, mod_feats = self._forward_pair(
                params, modality, seq_inputs, mod_inputs, deterministic=True)
            loss = self._loss_value(mod_feats, seq_feats)
            return seq_feats, mod_feats, loss

        return jax.jit(step_fn)

    def eval_step(self, params, modality: str, seq_inputs, mod_inputs):
        if modality not in self._eval_step_cache:
            self._eval_step_cache[modality] = self._build_eval_step(modality)
        seq_inputs, mod_inputs = self._shard_batch(seq_inputs, mod_inputs)
        return self._eval_step_cache[modality](params, seq_inputs, mod_inputs)

    def eval_step_cached(self, params, modality: str, seq_pooled, mod_inputs):
        """Eval step consuming a cached pooled hub representation."""
        key = ("eval_cached", modality)
        if key not in self._eval_step_cache:
            def step_fn(params, seq_pooled, mod_inputs):
                seq_feats = self.model.apply(
                    {"params": params}, seq_pooled, "sequence",
                    method=OneProtModel.head_from_pooled)
                mod_feats = self.model.apply(
                    {"params": params}, mod_inputs, modality,
                    deterministic=True)
                loss = self._loss_value(mod_feats, seq_feats)
                return seq_feats, mod_feats, loss

            self._eval_step_cache[key] = jax.jit(step_fn)
        seq_pooled, mod_inputs = self._shard_batch(seq_pooled, mod_inputs)
        return self._eval_step_cache[key](params, seq_pooled, mod_inputs)

    # -- helpers ---------------------------------------------------------------

    def _activate_kernels(self) -> None:
        """Re-establish THIS module's mesh/platform for kernel dispatch.

        The dispatch globals (kernels.attention._ACTIVE_MESH/_PLATFORM) are
        read at TRACE time, and jitted steps trace lazily — on the first
        call per (modality, bucket shape), which can happen long after
        init. A second module initialized in between (sweep trials, a
        mesh-less serving module after training) would otherwise leave ITS
        mesh active and this module's next new-shape trace would compile
        with the wrong shard_map wrapping. Called from every public step
        entry; two global assignments, so per-step cost is nil."""
        from oneprot_tpu import kernels as kernels_lib

        kernels_lib.set_active_mesh(self.mesh)

    def _shard_batch(self, seq_inputs, mod_inputs):
        self._activate_kernels()
        if self.mesh is None:
            return (jax.tree.map(jnp.asarray, seq_inputs),
                    jax.tree.map(jnp.asarray, mod_inputs))
        dp = self.mesh.shape[mesh_lib.DATA_AXIS]
        batch = jax.tree.leaves(seq_inputs)[0].shape[0]
        nproc = jax.process_count()
        if nproc > 1:
            # multi-host: each process holds its own shard of the global
            # batch (the loader samples rank::nproc); assemble the global
            # array from process-local data
            data = NamedSharding(self.mesh, P(mesh_lib.DATA_AXIS))
            put = lambda x: jax.make_array_from_process_local_data(
                data, np.asarray(x))
            return jax.tree.map(put, seq_inputs), jax.tree.map(put, mod_inputs)
        if batch % dp == 0:
            sharding = NamedSharding(self.mesh, P(mesh_lib.DATA_AXIS))
        else:
            # ragged tail batch (val/test, drop_last=False): replicate rather
            # than bias metrics with padding rows
            sharding = NamedSharding(self.mesh, P())
        put = lambda x: jax.device_put(jnp.asarray(x), sharding)
        return jax.tree.map(put, seq_inputs), jax.tree.map(put, mod_inputs)

    def modalities_to_train(self, step: int, batch_keys) -> list:
        """Curriculum gate (reference oneprot_module.py:84-90)."""
        if step < self.train_on_all_modalities_after_step:
            return [m for m in ("struct_token",) if m in batch_keys]
        mods = list(batch_keys)
        if not self.use_seqsim and "seqsim" in mods:
            mods.remove("seqsim")
        return mods

    def num_params(self) -> Tuple[int, int]:
        """(total, trainable) parameter counts."""
        assert self.state is not None
        total = optim_lib.count_params(self.state.params)
        trainable, _ = optim_lib.partition_params(self.state.params, self.mask)
        return total, optim_lib.count_params(trainable)
