"""TPU compute kernels: Pallas implementations with jnp reference fallbacks.

Dispatch policy: Pallas kernels engage on real TPU backends for shapes that
tile well onto the MXU; everything else (CPU tests, tiny debug shapes) uses
the jnp reference path, which XLA fuses adequately. Numerics of the two paths
are asserted equal in tests/test_kernels.py.
"""

from oneprot_tpu.kernels.attention import (  # noqa: F401
    dot_product_attention,
    fused_mha,
    fused_tied_row,
    set_active_mesh,
)
from oneprot_tpu.kernels.segment_ops import (  # noqa: F401
    segment_mean,
    segment_softmax,
    segment_sum,
)
