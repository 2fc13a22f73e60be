"""Decompose the MSA sub-step cost on the real chip (VERDICT r3 #6 follow-up).

The all-modalities bench measured the MSA sub-step at 850-913 ms — 10x the
other towers — and switching the tower to bf16 moved it only ~7%, so the
cost is NOT GEMM-FLOP-bound.  This times each candidate in isolation at the
production geometry (B=16 MSAs x depth 50 x cols 256, d=768, 12 layers):

  tower_fwd   full MsaTransformer forward (bf16 and f32)
  row_qk      tied row attention QK einsum  brihd,brjhd->bhij
  row_pv      tied row attention PV einsum  bhij,brjhd->brihd
  col_attn    column attention pair of einsums (the [50x64]x[64x50]
              per-(b,l,h) small-dot suspect)
  gemms       the 12-layer equivalent dense projections over B*R*L tokens

Run: python scripts/microbench_msa.py   (real chip)
Env: MSA_VARIANTS=tower_fwd,row_qk,... to subset; MSA_B/DEPTH/COLS sizes.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from oneprot_tpu.core.mesh import enable_compilation_cache

B = int(os.environ.get("MSA_B", 16))
R = int(os.environ.get("MSA_DEPTH", 50))
L = int(os.environ.get("MSA_COLS", 256))
H = 768
NH, HD = 12, 64
LAYERS = 12
N = 10


def timed(fn, *args, n=N):
    """n iterations inside ONE jitted scan, outputs max-folded to a scalar
    that is float()-forced — the only reliable wall pattern through the
    tunneled backend (see scripts/microbench_tower_attn.py). Integer args
    roll along axis 0 per iteration so the body isn't loop-invariant."""
    @jax.jit
    def many(a):
        def body(carry, i):
            # roll direct array args (NOT param trees — rolling 100M
            # params would dominate) so the body isn't loop-invariant
            rolled = [jnp.roll(x, i, axis=0) if hasattr(x, "ndim") else x
                      for x in a]
            out = fn(*rolled)
            for leaf in jax.tree.leaves(out):
                carry = jnp.maximum(carry, leaf.astype(jnp.float32).max())
            return carry, None

        tot, _ = jax.lax.scan(body, jnp.float32(-jnp.inf),
                              jnp.arange(n, dtype=jnp.int32))
        return tot

    float(many(args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(args))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    enable_compilation_cache()
    variants = os.environ.get(
        "MSA_VARIANTS", "tower_fwd,row_qk,row_pv,col_attn,gemms").split(",")
    rng = np.random.RandomState(0)

    if "tower_fwd" in variants:
        from oneprot_tpu.models.msa_transformer import (
            MsaTransformer,
            MsaTransformerConfig,
        )

        tokens = jnp.asarray(
            rng.randint(4, 24, size=(B, R, L)).astype(np.int32))
        for dt in (jnp.bfloat16, jnp.float32):
            cfg = MsaTransformerConfig(num_layers=LAYERS, hidden_size=H,
                                       num_heads=NH, max_positions=1024)
            model = MsaTransformer(cfg, dtype=dt)
            params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens)
            t = timed(model.apply, params, tokens)
            print(f"tower_fwd {jnp.dtype(dt).name}: {t*1e3:.1f} ms")

    q5 = jnp.asarray(rng.randn(B, R, L, NH, HD), jnp.bfloat16)
    k5 = jnp.asarray(rng.randn(B, R, L, NH, HD), jnp.bfloat16)
    v5 = jnp.asarray(rng.randn(B, R, L, NH, HD), jnp.bfloat16)
    probs = jnp.asarray(rng.rand(B, NH, L, L), jnp.bfloat16)

    if "row_qk" in variants:
        t = timed(lambda q, k: jnp.einsum(
            "brihd,brjhd->bhij", q, k,
            preferred_element_type=jnp.float32), q5, k5)
        print(f"row_qk: {t*1e3:.2f} ms/layer-equiv "
              f"(x{LAYERS} = {t*LAYERS*1e3:.0f} ms)")
    if "row_pv" in variants:
        t = timed(lambda p, v: jnp.einsum(
            "bhij,brjhd->brihd", p, v,
            preferred_element_type=jnp.float32), probs, v5)
        print(f"row_pv: {t*1e3:.2f} ms/layer-equiv "
              f"(x{LAYERS} = {t*LAYERS*1e3:.0f} ms)")
    if "col_attn" in variants:
        def col(q, k, v):
            logits = jnp.einsum("brlhd,bslhd->blhrs", q, k,
                                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            return jnp.einsum("blhrs,bslhd->brlhd", p, v,
                              preferred_element_type=jnp.float32)

        t = timed(col, q5, k5, v5)
        print(f"col_attn: {t*1e3:.2f} ms/layer-equiv "
              f"(x{LAYERS} = {t*LAYERS*1e3:.0f} ms)")

    if "col_lanes" in variants:
        # same dots, but logits laid out [b,h,r,s,l]: l=256 fills the
        # lane dim instead of s=50 (which pads to 128) — probes whether
        # the baseline cost is layout, not dot issue
        def col_lanes(q, k, v):
            logits = jnp.einsum("brlhd,bslhd->bhrsl", q, k,
                                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(logits, axis=-2).astype(v.dtype)
            return jnp.einsum("bhrsl,bslhd->brlhd", p, v,
                              preferred_element_type=jnp.float32)

        t = timed(col_lanes, q5, k5, v5)
        print(f"col_lanes: {t*1e3:.2f} ms/layer-equiv "
              f"(x{LAYERS} = {t*LAYERS*1e3:.0f} ms)")

    # Block-diagonal head packing: the baseline decomposes into B*L*nh
    # tiny [R,hd]x[hd,R] dots (half-lane contraction, R/128 output fill)
    # that are MXU weight-load/issue-bound. Packing G heads gives one
    # [R, G*hd] x [G*hd, G*R] dot per head group — G x fewer dots, full
    # 128-lane contraction at G=2 — at the cost of materializing the
    # G x larger block-diagonal k/v (zeros fraction 1-1/G).
    for name in [v for v in variants if v.startswith("col_pack")]:
        G = int(name[len("col_pack"):])

        def col_packed(q, k, v, G=G):
            B_, R_, L_, nh_, hd_ = q.shape
            NG = nh_ // G
            eye = jnp.eye(G, dtype=q.dtype)
            # [B,L,NG,R,G*hd]
            qc = q.transpose(0, 2, 3, 1, 4).reshape(
                B_, L_, NG, G, R_, hd_).transpose(0, 1, 2, 4, 3, 5).reshape(
                B_, L_, NG, R_, G * hd_)
            k6 = k.transpose(0, 2, 3, 1, 4).reshape(B_, L_, NG, G, R_, hd_)
            v6 = v.transpose(0, 2, 3, 1, 4).reshape(B_, L_, NG, G, R_, hd_)
            # k_bd [B,L,NG, G*hd, G*R]: kbd[...,i*hd+d, j*R+s] =
            # k6[...,i,s,d] * eye[i,j]
            kbd = jnp.einsum("blnisd,ij->blnidjs", k6, eye).reshape(
                B_, L_, NG, G * hd_, G * R_)
            logits = jnp.matmul(qc, kbd,
                                preferred_element_type=jnp.float32)
            logits = logits.reshape(B_, L_, NG, R_, G, R_)
            p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            pc = p.reshape(B_, L_, NG, R_, G * R_)
            # v_bd [B,L,NG, G*R, G*hd]: vbd[...,i*R+s, j*hd+d] =
            # v6[...,i,s,d] * eye[i,j]
            vbd = jnp.einsum("blnisd,ij->blnisjd", v6, eye).reshape(
                B_, L_, NG, G * R_, G * hd_)
            ctx = jnp.matmul(pc, vbd, preferred_element_type=jnp.float32)
            ctx = ctx.reshape(B_, L_, NG, R_, G, hd_).transpose(
                0, 3, 1, 2, 4, 5).reshape(B_, R_, L_, nh_, hd_)
            return ctx

        # numerics vs baseline once per G (same math, f32 accumulation)
        def col_ref(q, k, v):
            logits = jnp.einsum("brlhd,bslhd->blhrs", q, k,
                                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            return jnp.einsum("blhrs,bslhd->brlhd", p, v,
                              preferred_element_type=jnp.float32)

        qs, ks, vs = q5[:2, :, :64], k5[:2, :, :64], v5[:2, :, :64]
        ref = col_ref(qs, ks, vs)
        got = col_packed(qs, ks, vs)
        err = float(jnp.max(jnp.abs(ref - got)) /
                    (float(jnp.max(jnp.abs(ref))) + 1e-9))
        t = timed(col_packed, q5, k5, v5)
        print(f"col_pack{G}: {t*1e3:.2f} ms/layer-equiv "
              f"(x{LAYERS} = {t*LAYERS*1e3:.0f} ms)  max-rel-err {err:.1e}")
    # Column stacking: pack G columns into one attention "sequence" of
    # G*R rows and mask cross-column logits. Dots grow to [G*R,hd]x[hd,G*R]
    # (better sublane fill, G x fewer dots) WITHOUT materializing
    # block-diagonal k/v — only reshapes + an additive mask. FLOPs grow
    # G x but the baseline runs <1% MXU, so FLOPs are free here.
    def _stack_cols(x, G):
        B_, R_, L_, nh_, hd_ = x.shape
        # [B, L/G, G*R, nh, hd] with rows grouped column-major (all R rows
        # of column g are contiguous)
        return x.transpose(0, 2, 1, 3, 4).reshape(
            B_, L_ // G, G * R_, nh_, hd_)

    def col_ref(q, k, v):
        logits = jnp.einsum("brlhd,bslhd->blhrs", q, k,
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("blhrs,bslhd->brlhd", p, v,
                          preferred_element_type=jnp.float32)

    for name in [v for v in variants if v.startswith("col_stack")]:
        G = int(name[len("col_stack"):])

        def col_stacked(q, k, v, G=G):
            B_, R_, L_, nh_, hd_ = q.shape
            qs, ks, vs = (_stack_cols(x, G) for x in (q, k, v))
            seg = jnp.arange(G * R_) // R_
            mask = jnp.where(seg[:, None] == seg[None, :], 0.0, -1e30)
            logits = jnp.einsum("blphd,blqhd->blhpq", qs, ks,
                                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(logits + mask, axis=-1).astype(v.dtype)
            ctx = jnp.einsum("blhpq,blqhd->blphd", p, vs,
                             preferred_element_type=jnp.float32)
            return ctx.reshape(B_, L_ // G, G, R_, nh_, hd_).transpose(
                0, 3, 1, 2, 4, 5).reshape(B_, R_, L_, nh_, hd_)

        qs_, ks_, vs_ = q5[:2, :, :64], k5[:2, :, :64], v5[:2, :, :64]
        err = float(jnp.max(jnp.abs(col_ref(qs_, ks_, vs_) -
                                    col_stacked(qs_, ks_, vs_))) /
                    (float(jnp.max(jnp.abs(col_ref(qs_, ks_, vs_)))) + 1e-9))
        t = timed(col_stacked, q5, k5, v5)
        print(f"col_stack{G}: {t*1e3:.2f} ms/layer-equiv "
              f"(x{LAYERS} = {t*LAYERS*1e3:.0f} ms)  max-rel-err {err:.1e}")

    for name in [v for v in variants if v.startswith("col_flash")]:
        G = int(name[len("col_flash"):])

        def col_flash(q, k, v, G=G):
            from oneprot_tpu.kernels import flash_mha
            B_, R_, L_, nh_, hd_ = q.shape
            P = G * R_
            Pp = -(-P // 128) * 128   # kernel wants 128-multiple seq
            qs, ks, vs = (jnp.pad(
                _stack_cols(x, G).reshape(B_ * (L_ // G), P, nh_ * hd_),
                ((0, 0), (0, Pp - P), (0, 0))) for x in (q, k, v))
            # pad rows get their own segment id G: they only attend to
            # each other (no NaNs) and are sliced off below
            seg = jnp.broadcast_to(
                jnp.minimum(jnp.arange(Pp, dtype=jnp.int32) // R_, G)[None],
                (B_ * (L_ // G), Pp))
            # the kernel applies 1/sqrt(hd); the reference einsum has no
            # scale, so pre-multiply q to cancel it
            ctx = flash_mha.mha_attention(
                qs * (hd_ ** 0.5), ks, vs, nh_, segment_ids=seg)[:, :P]
            return ctx.reshape(B_, L_ // G, G, R_, nh_, hd_).transpose(
                0, 3, 1, 2, 4, 5).reshape(B_, R_, L_, nh_, hd_)

        qs_, ks_, vs_ = q5[:2, :, :64], k5[:2, :, :64], v5[:2, :, :64]
        err = float(jnp.max(jnp.abs(col_ref(qs_, ks_, vs_) -
                                    col_flash(qs_, ks_, vs_))) /
                    (float(jnp.max(jnp.abs(col_ref(qs_, ks_, vs_)))) + 1e-9))
        t = timed(col_flash, q5, k5, v5)
        print(f"col_flash{G}: {t*1e3:.2f} ms/layer-equiv "
              f"(x{LAYERS} = {t*LAYERS*1e3:.0f} ms)  max-rel-err {err:.1e}")

    if "gemms" in variants:
        x = jnp.asarray(rng.randn(B * R * L, H), jnp.bfloat16)
        w1 = jnp.asarray(rng.randn(H, 4 * H) * 0.02, jnp.bfloat16)
        w2 = jnp.asarray(rng.randn(4 * H, H) * 0.02, jnp.bfloat16)
        wq = jnp.asarray(rng.randn(H, H) * 0.02, jnp.bfloat16)

        def layer_gemms(x):
            # 8 square projections (row+col qkvo) + FFN pair
            for _ in range(8):
                x = x + jnp.dot(x, wq, preferred_element_type=jnp.bfloat16)
            return x + jnp.dot(
                jax.nn.gelu(jnp.dot(x, w1,
                                    preferred_element_type=jnp.bfloat16)),
                w2, preferred_element_type=jnp.bfloat16)

        t = timed(layer_gemms, x)
        print(f"gemms: {t*1e3:.2f} ms/layer-equiv "
              f"(x{LAYERS} = {t*LAYERS*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
