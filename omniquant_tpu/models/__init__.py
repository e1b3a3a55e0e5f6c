from . import falcon, llama, opt
from .common import ActQuantSpec, NO_ACT_QUANT, causal_mask
from .registry import FAMILIES, FALCON, LLAMA, OPT, ModelFamily, get_family
