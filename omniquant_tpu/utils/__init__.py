from .checkpoint import save_pytree, load_pytree
from .logging import create_logger
from .profiling import PROFILER, Profiler, device_memory_stats, phase, trace
