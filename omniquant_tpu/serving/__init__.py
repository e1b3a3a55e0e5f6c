from .engine import LlamaEngine, OPTEngine, fuse_packed
from .export import pack_model
