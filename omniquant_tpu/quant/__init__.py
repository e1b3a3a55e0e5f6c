from .quantizer import (
    QuantConfig,
    round_ste,
    fake_quant_weight,
    fake_quant_act,
    init_lwc_params,
    weight_scale_zp,
    quantize_weight_int,
    dequantize_weight_int,
    CLIPMIN,
)
from .transform import (
    truncate_number,
    smooth_ln_fcs,
    smooth_fc_fc,
    smooth_fc_fc_gqa,
    smooth_q_k,
)
from .packing import (
    PackedWeight,
    pack_codes,
    unpack_codes,
    pack_weight,
    dequantize_packed,
    vals_per_word,
)
