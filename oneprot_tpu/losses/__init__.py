from oneprot_tpu.losses.clip import clip_loss, clip_loss_masked  # noqa: F401
from oneprot_tpu.losses.siglip import siglip_loss, siglip_loss_masked  # noqa: F401


def get_loss_fn(name: str):
    """'CLIP' | 'SIGLIP' (reference oneprot_module.py:48-64)."""
    name = name.upper()
    if name == "CLIP":
        return clip_loss
    if name == "SIGLIP":
        return siglip_loss
    raise ValueError(f"Unknown loss function: {name}")
