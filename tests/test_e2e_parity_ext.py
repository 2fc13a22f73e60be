"""Extended learning-dynamics parity vs the torch reference (VERDICT r2 #4).

Widens tests/test_e2e_parity.py beyond CLIP/seq<->struct_token:
  (a) SigLIP dynamics (reference loss.py:204-311, single-rank dense form)
  (b) LoRA-enabled frozen hub vs peft-wrapped torch towers, incl. the
      bias="all" trainability split (reference sequence_encoder.py:61-74)
  (c) CLIP local_loss=True across 2 REAL torch-gloo DDP ranks vs the
      sharded clip_loss on a 2-device mesh — rank-offset label math under
      actual multi-rank gradients (reference loss.py:76-93)
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(os.path.join(REFERENCE, "src")),
                       reason="reference checkout not available"),
]

if os.path.isdir(os.path.join(REFERENCE, "src")):
    sys.path.insert(0, REFERENCE)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.test_e2e_parity import (  # noqa: E402
    _batches,
    _build_torch_towers,
    _copy_heads_jax_to_torch,
    _esm_cfg,
    B,
    LAYERS,
    LR,
)

STEPS = 12


def _aligned_modules(loss_fn_name):
    """Shared setup: torch reference towers + jax module with identical
    initial weights (same alignment as test_e2e_parity)."""
    from tests.helpers.tiny_models import build_tiny_module
    from oneprot_tpu.models.hf_convert import convert_esm2_state_dict
    from oneprot_tpu.train.module import TrainState, _graft

    seq_t, st_t = _build_torch_towers()
    module = build_tiny_module(mesh=None, loss_fn=loss_fn_name)
    module.use_l1_regularization = False
    batches = _batches(STEPS + 1)
    state = module.init({"struct_token": batches[0]})

    def converted(tower):
        sd = convert_esm2_state_dict(tower.transformer.state_dict(), LAYERS)
        return jax.tree.map(lambda x: np.array(x, copy=True), sd)

    params = state.params
    params["encoders_sequence"]["transformer"] = _graft(
        params["encoders_sequence"]["transformer"], converted(seq_t))
    params["encoders_struct_token"]["transformer"] = _graft(
        params["encoders_struct_token"]["transformer"], converted(st_t))
    _copy_heads_jax_to_torch(params, seq_t, st_t)
    state = TrainState(step=state.step, params=params,
                       opt_state=state.opt_state)
    module.state = state
    return module, state, seq_t, st_t, batches


def test_siglip_training_dynamics_match_reference():
    """SigLIP dynamics parity: the module's convention (logit scale folded
    into the features by the tower's LogitScale head; siglip_loss called with
    logit_scale=1) against the reference SigLipLoss on the same convention."""
    from src.models.components.loss import SigLipLoss

    module, state, seq_t, st_t, batches = _aligned_modules("SIGLIP")

    loss_fn = SigLipLoss(rank=0, world_size=1)
    opt = torch.optim.Adam(
        list(seq_t.parameters()) + list(st_t.parameters()), lr=LR,
        betas=(0.9, 0.999), eps=1e-8)
    torch_losses = []
    seq_t.train(); st_t.train()
    for seq_ids, st_ids in batches[:STEPS]:
        seq_f = seq_t(torch.tensor(seq_ids.astype(np.int64)))
        st_f = st_t(torch.tensor(st_ids.astype(np.int64)))
        opt.zero_grad()
        loss = loss_fn(seq_f, st_f, logit_scale=torch.tensor(1.0))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(
            list(seq_t.parameters()) + list(st_t.parameters()), 1.0)
        opt.step()
        torch_losses.append(float(loss))

    jax_losses = []
    for seq_ids, st_ids in batches[:STEPS]:
        state, loss = module.train_step(state, "struct_token", seq_ids, st_ids)
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses[:5], torch_losses[:5], rtol=2e-3,
                               err_msg="early SigLIP loss curve diverged")
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=3e-2,
                               err_msg="SigLIP loss curve diverged")
    assert jax_losses[-1] < jax_losses[0], "no learning progress"


def test_lora_training_dynamics_match_peft():
    """Frozen hub + LoRA(q/k/v, bias='all') vs peft-wrapped torch: identical
    init (peft's kaiming lora_A copied over), identical trainable sets, and
    matching loss curves. lora_dropout=0 for determinism (its train-mode
    behavior is tested in test_models)."""
    peft = pytest.importorskip("peft")
    from src.models.components.loss import ClipLoss

    from tests.helpers.tiny_models import patch_tiny_esm2
    from oneprot_tpu.models.encoders import (
        create_sequence_encoder,
        create_struct_token_encoder,
    )
    from oneprot_tpu.models.hf_convert import convert_esm2_state_dict
    from oneprot_tpu.train.module import OneProtModule, TrainState, _graft
    from oneprot_tpu.train.optim import adam

    patch_tiny_esm2()
    seq_t, st_t = _build_torch_towers()
    # reference SequenceEncoder: freeze, then peft-wrap (sequence_encoder.py:
    # 57-74); frozen base + trainable lora_A/B + ALL biases (bias="all")
    for p in seq_t.transformer.parameters():
        p.requires_grad = False
    peft_cfg = peft.LoraConfig(
        task_type=peft.TaskType.FEATURE_EXTRACTION, inference_mode=False,
        r=4, lora_alpha=8, lora_dropout=0.0,
        target_modules=["query", "key", "value"], bias="all")
    seq_t.transformer = peft.get_peft_model(seq_t.transformer, peft_cfg)

    seq_enc = create_sequence_encoder(
        model_name_or_path="facebook/esm2_t6_8M_UR50D", output_dim=32,
        proj_type="mlp", frozen=True, use_lora=True, lora_r=4, lora_alpha=8,
        lora_dropout=0.0, pretrained=False, dtype="float32")
    st_enc = create_struct_token_encoder(
        model_name_or_path="facebook/esm2_t6_8M_UR50D", output_dim=32,
        dtype="float32")
    module = OneProtModule(
        components={"sequence": seq_enc, "struct_token": st_enc},
        optimizer=lambda: adam(LR), loss_fn="CLIP", seed=0,
        frozen_param_dtype=None)
    module.use_l1_regularization = False
    batches = _batches(STEPS + 1, seed=11)
    state = module.init({"struct_token": batches[0]})

    # align base transformer weights (torch -> jax) and peft's lora_A init
    base_sd = {k.replace("base_model.model.", "").replace(".base_layer", ""):
               v for k, v in seq_t.transformer.state_dict().items()
               if "lora_" not in k}
    params = state.params
    params["encoders_sequence"]["transformer"] = _graft(
        params["encoders_sequence"]["transformer"],
        jax.tree.map(lambda x: np.array(x, copy=True),
                     convert_esm2_state_dict(base_sd, LAYERS)))
    psd = seq_t.transformer.state_dict()
    name = {"q": "query", "k": "key", "v": "value"}
    for i in range(LAYERS):
        for proj in ("q", "k", "v"):
            a = psd[f"base_model.model.encoder.layer.{i}.attention.self."
                    f"{name[proj]}.lora_A.default.weight"]
            node = params["encoders_sequence"]["transformer"][f"layer_{i}"][
                "attn"][proj]
            node["lora_A"] = np.array(a.numpy().T, copy=True)
            node["lora_B"] = np.zeros_like(node["lora_B"])
    params["encoders_struct_token"]["transformer"] = _graft(
        params["encoders_struct_token"]["transformer"],
        jax.tree.map(lambda x: np.array(x, copy=True),
                     convert_esm2_state_dict(st_t.transformer.state_dict(),
                                             LAYERS)))
    _copy_heads_jax_to_torch(params, seq_t, st_t)
    state = TrainState(step=state.step, params=params,
                       opt_state=state.opt_state)
    # trainable-set check: lora factors + biases trainable inside the frozen
    # hub transformer, kernels not
    tr = module.mask["encoders_sequence"]["transformer"]["layer_0"]["attn"]["q"]
    assert tr["lora_A"] and tr["lora_B"]
    assert tr["dense"]["bias"] and not tr["dense"]["kernel"]

    # exclude HF EsmModel's contact_head: it is not in the forward path
    # (grads stay None, Adam never touches it) and our architecture has no
    # equivalent appendage
    torch_train = [p for n, p in seq_t.transformer.named_parameters()
                   if p.requires_grad and "contact_head" not in n]
    torch_train += list(seq_t.proj.parameters())
    torch_train += [p for n, p in st_t.named_parameters()
                    if "contact_head" not in n]
    # jax trainable count must equal torch's (same bias="all" semantics)
    n_jax = sum(int(np.prod(np.shape(p)))
                for p, m in zip(jax.tree.leaves(state.params),
                                jax.tree.leaves(module.mask)) if m)
    n_torch = sum(p.numel() for p in torch_train)
    assert n_jax == n_torch, (n_jax, n_torch)

    loss_fn = ClipLoss(local_loss=False, gather_with_grad=False, rank=0,
                       world_size=1)
    opt = torch.optim.Adam(torch_train, lr=LR, betas=(0.9, 0.999), eps=1e-8)
    torch_losses = []
    seq_t.train(); st_t.train()
    for seq_ids, st_ids in batches[:STEPS]:
        seq_f = seq_t(torch.tensor(seq_ids.astype(np.int64)))
        st_f = st_t(torch.tensor(st_ids.astype(np.int64)))
        opt.zero_grad()
        loss = loss_fn(seq_f, st_f)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(torch_train, 1.0)
        opt.step()
        torch_losses.append(float(loss))

    jax_losses = []
    for seq_ids, st_ids in batches[:STEPS]:
        state, loss = module.train_step(state, "struct_token", seq_ids, st_ids)
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses[:5], torch_losses[:5], rtol=2e-3,
                               err_msg="early LoRA loss curve diverged")
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=3e-2,
                               err_msg="LoRA loss curve diverged")
    # LoRA actually moved
    lb = state.params["encoders_sequence"]["transformer"]["layer_0"]["attn"][
        "q"]["lora_B"]
    assert float(np.abs(np.asarray(lb)).max()) > 0


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_local_loss_matches_two_rank_ddp(tmp_path):
    """Reference ClipLoss(local_loss=True, gather_with_grad=True) on 2 REAL
    torch-gloo ranks (differentiable all_gather reduces cross-rank feature
    grads; weight grads then DDP-averaged) vs our sharded clip_loss under
    shard_map on a 2-device mesh: loss and weight gradients must match."""
    port = _free_port()
    child = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "helpers", "ddp_clip_child.py")
    procs, outs = [], []
    env = dict(os.environ)
    for r in range(2):
        out = str(tmp_path / f"ddp_{r}.npz")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, child, str(r), "2", str(port), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=300)
        logs.append(stdout.decode())
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)
    d0, d1 = dict(np.load(outs[0])), dict(np.load(outs[1]))
    np.testing.assert_allclose(d0["w_grad"], d1["w_grad"], rtol=1e-5)

    # jax side: same data/weights, sharded loss over a 2-device mesh
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from oneprot_tpu.losses import clip_loss

    GLOBAL_B, D_IN, D_OUT = 16, 12, 8
    rng = np.random.RandomState(0)
    x_mod = jnp.asarray(rng.randn(GLOBAL_B, D_IN).astype(np.float32))
    x_seq = jnp.asarray(rng.randn(GLOBAL_B, D_IN).astype(np.float32))
    w0 = jnp.asarray(rng.randn(D_IN, D_OUT).astype(np.float32) * 0.3)

    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))

    def norm(z):
        return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True),
                               1e-12)

    def loss_of(w):
        mod_f = norm(x_mod @ w)
        seq_f = norm(x_seq @ w)
        sharded = jax.shard_map(
            lambda m, s: clip_loss(m, s, logit_scale=10.0, axis_name="data",
                                   local_loss=True),
            mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
            check_vma=False)
        return sharded(mod_f, seq_f)

    loss, grad = jax.value_and_grad(loss_of)(w0)
    np.testing.assert_allclose(float(loss), d0["mean_loss"], rtol=1e-5,
                               err_msg="sharded loss != DDP mean loss")
    np.testing.assert_allclose(np.asarray(grad), d0["w_grad"], rtol=1e-4,
                               atol=1e-7,
                               err_msg="sharded weight grads != DDP grads")
