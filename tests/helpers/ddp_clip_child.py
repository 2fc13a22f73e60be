"""Child for the multi-rank local_loss parity test (VERDICT r2 #4c).

Usage: python ddp_clip_child.py <rank> <world> <port> <out_npz>

Each torch-gloo rank holds a contiguous row block of the global batch,
computes features through a SHARED linear tower, runs the reference
ClipLoss(local_loss=True, gather_with_grad=True) — whose differentiable
all_gather reduces cross-rank feature grads (reference loss.py:31-33,
76-93) — backwards, then manually all-reduce-means the weight grads (what
DDP does). Writes per-rank loss + averaged weight grads for the parent to
compare against the sharded jax clip_loss on a 2-device mesh.
"""

import os
import sys

import numpy as np
import torch
import torch.distributed as dist

rank, world, port, out_npz = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])
dist.init_process_group("gloo", init_method=f"tcp://127.0.0.1:{port}",
                        rank=rank, world_size=world)

REFERENCE = "/root/reference"
sys.path.insert(0, REFERENCE)
from src.models.components.loss import ClipLoss  # noqa: E402

GLOBAL_B, D_IN, D_OUT = 16, 12, 8
rng = np.random.RandomState(0)
x_mod = rng.randn(GLOBAL_B, D_IN).astype(np.float32)
x_seq = rng.randn(GLOBAL_B, D_IN).astype(np.float32)
w0 = rng.randn(D_IN, D_OUT).astype(np.float32) * 0.3

b = GLOBAL_B // world
sl = slice(rank * b, (rank + 1) * b)  # contiguous row blocks = mesh shards

w = torch.tensor(w0, requires_grad=True)
mod_f = torch.nn.functional.normalize(torch.tensor(x_mod[sl]) @ w, dim=-1)
seq_f = torch.nn.functional.normalize(torch.tensor(x_seq[sl]) @ w, dim=-1)

loss_fn = ClipLoss(local_loss=True, gather_with_grad=True, rank=rank,
                   world_size=world)
loss = loss_fn(mod_f, seq_f, logit_scale=torch.tensor(10.0))
loss.backward()

# DDP semantics: average weight grads across ranks
g = w.grad.detach().clone()
dist.all_reduce(g)
g /= world
loss_sum = loss.detach().clone()
dist.all_reduce(loss_sum)

np.savez(out_npz, loss=float(loss), mean_loss=float(loss_sum) / world,
         w_grad=g.numpy())
print(f"rank {rank}: loss={float(loss):.6f}")
