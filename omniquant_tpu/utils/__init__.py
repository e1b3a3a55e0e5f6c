from .checkpoint import save_pytree, load_pytree
from .logging import create_logger
