from .engine import FalconEngine, LlamaEngine, OPTEngine, fuse_packed
from .export import pack_model
from .tp_engine import TP_ENGINES, TPFalconEngine, TPLlamaEngine, TPOPTEngine
