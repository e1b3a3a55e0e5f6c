from . import llama, opt
from .common import ActQuantSpec, NO_ACT_QUANT, causal_mask
from .registry import FAMILIES, LLAMA, OPT, ModelFamily, get_family
