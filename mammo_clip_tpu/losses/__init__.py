from .clip_loss import (
    cross_entropy,
    multi_positive_clip_loss,
    contrastive_clip_loss,
)
from .classification import bce_with_logits_loss
from .combined import build_loss
