from .pooling import gem_pool, global_avg_pool
from .stochastic import drop_connect
