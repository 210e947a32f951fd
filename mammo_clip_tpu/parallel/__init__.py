from .constraint import shard_seq
from .partitioning import partition_params, shard_train_state, PARTITION_RULES
from .shard_loss import shard_map_clip_loss
