from .partitioning import partition_params, PARTITION_RULES
from .shard_loss import shard_map_clip_loss
