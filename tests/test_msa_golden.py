"""MSA-Transformer golden replay (torch-free).

The committed golden (tests/goldens/msa_oracle_golden.npz) records the
independent torch oracle's state_dict, a fixed token batch, and the
oracle's output (generated once by tests/test_msa_oracle.py's MsaOracle —
see scripts/verify_msa1b.py for the REAL-weights closure a fair-esm user
runs). This replay pushes the recorded state_dict through the real
`convert_msa1b_state_dict` converter and asserts the flax tower still
reproduces the recorded output — so converter or tower regressions are
caught even on hosts without torch, and the pinned numbers can never
silently drift with a torch upgrade (VERDICT r2 next-round #9).
"""

import os

import jax.numpy as jnp
import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "msa_oracle_golden.npz")


def test_msa_transformer_matches_committed_golden():
    from oneprot_tpu.models.hf_convert import convert_msa1b_state_dict
    from oneprot_tpu.models.msa_transformer import (
        MsaTransformer,
        MsaTransformerConfig,
    )

    data = np.load(GOLDEN)
    tokens = data["tokens"]
    want = data["expected"]
    sd = {k[len("sd::"):]: data[k] for k in data.files
          if k.startswith("sd::")}
    num_layers = 1 + max(int(k.split(".")[1]) for k in sd
                         if k.startswith("layers."))
    hidden = sd["embed_tokens.weight"].shape[1]
    ffn = sd["layers.0.feed_forward_layer.layer.fc1.weight"].shape[0]

    cfg = MsaTransformerConfig(
        vocab_size=sd["embed_tokens.weight"].shape[0],
        hidden_size=hidden, num_layers=num_layers,
        num_heads=2, intermediate_size=ffn,
        max_positions=tokens.shape[2], max_rows=1024)
    params = convert_msa1b_state_dict(sd, num_layers)
    got = np.asarray(MsaTransformer(cfg).apply(
        {"params": params}, jnp.asarray(tokens)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
