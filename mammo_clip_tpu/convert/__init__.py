from .torch_import import convert_clip_checkpoint, convert_state_dict
from .torch_export import export_clip_checkpoint, export_state_dict
