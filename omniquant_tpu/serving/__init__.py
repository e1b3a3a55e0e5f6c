from .engine import FalconEngine, LlamaEngine, OPTEngine, fuse_packed
from .export import pack_model
