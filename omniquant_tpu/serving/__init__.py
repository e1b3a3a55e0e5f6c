from .engine import FalconEngine, LlamaEngine, OPTEngine, fuse_packed
from .export import pack_model
from .spec_decode import SpecDecoder, layer_skip_params
from .tp_engine import TP_ENGINES, TPFalconEngine, TPLlamaEngine, TPOPTEngine
