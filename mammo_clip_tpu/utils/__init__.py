from .logging import MetricsLogger, AverageMeter
from .profiling import profile_trace, step_timer
