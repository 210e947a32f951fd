from .breast_crop import extract_breast_roi, breast_roi_bounds, remap_boxes
from .shard_writer import write_packed_shards
