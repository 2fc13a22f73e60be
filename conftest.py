"""Pytest root conftest: force a virtual 8-device CPU mesh for all tests.

This is the TPU build's equivalent of the reference's `ddp_sim` preset
(reference configs/trainer/ddp_sim.yaml:4-7, tests/test_train.py:52-61):
multi-device semantics are exercised hermetically with
`--xla_force_host_platform_device_count=8` on the CPU backend.

Must run before any test module imports jax AND must undo the axon
sitecustomize's `jax_platforms="axon,cpu"` override.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("ONEPROT_USE_PALLAS", "0")  # interpret-mode tests opt in

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite compiles many tiny train/eval steps
# repeatedly across tests and runs; caching them cuts suite time drastically.
# Keyed under a per-host fingerprint subdir so a checkout that migrates
# across machines never replays XLA:CPU AOT entries compiled for a
# different CPU (SIGILL risk; see core/mesh.py:host_cache_fingerprint).
from oneprot_tpu.core.mesh import host_cache_fingerprint  # noqa: E402

_CACHE_DIR = os.path.join(
    os.environ.get(
        "ONEPROT_TEST_JIT_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jit_cache")),
    host_cache_fingerprint())
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:  # older jax without these flags
    pass
