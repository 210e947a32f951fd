from .config import Config, load_config, save_config, default_pretrain_config
from .mesh import MeshContext, make_mesh, is_master
