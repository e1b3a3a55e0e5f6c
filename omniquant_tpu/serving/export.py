"""Real-quant export: pack calibrated fake-quant weights into int32 storage.

Role-equivalent of the reference's AutoGPTQ repack step
(quantize/omniquant.py:255-277), producing a pytree of PackedWeight per
linear that the Pallas serving kernels consume directly.

Important: this packs the *already folded+fake-quantized* weights — since
fake-quant is idempotent, re-deriving scale/zp from the dequantized values
reproduces the exact integer codes chosen during calibration (the LWC
factors are no longer needed; their effect is baked into the values, and
sigmoid(bound)≈1 re-quantization keeps min/max fixed points stable).
"""
from __future__ import annotations

from typing import Optional

from ..models.registry import ModelFamily
from ..quant.packing import pack_weight
from ..quant.quantizer import QuantConfig


def pack_model(
    family: ModelFamily,
    params: dict,
    wcfg: QuantConfig,
    omni_parameters: Optional[dict] = None,
    tile_k: Optional[int] = None,
    layout: str = "auto",
) -> dict:
    """Returns {'layers': [{linear_name: PackedWeight}, ...], plus the
    non-layer params passed through unchanged}.

    When `omni_parameters` (from calibrate()) is given, each linear is packed
    against its calibration-recorded scale/zero grid — an exact roundtrip of
    the folded fake-quant weights. Without it, scale/zp are re-derived from
    the dequantized values (exact whenever each group attains its extreme
    codes, which LWC clipping makes the common case)."""
    if wcfg is None or not wcfg.enabled:
        raise ValueError("pack_model needs an enabled weight quant config")
    pack_cfg = QuantConfig(
        n_bits=wcfg.n_bits, symmetric=wcfg.symmetric,
        group_size=wcfg.group_size, lwc=False)
    out = {k: v for k, v in params.items() if k != "layers"}
    packed_layers = []
    for i, block in enumerate(params["layers"]):
        qp = (omni_parameters or {}).get(i, {}).get("qparams", {})
        pb = {}
        for name, sub in block.items():
            if name in family.linear_names:
                kw = {}
                if name in qp:
                    kw = {"scale": qp[name]["scale"], "rzp": qp[name]["zero"]}
                pb[name] = pack_weight(
                    sub["weight"], pack_cfg, bias=sub.get("bias"),
                    tile_k=tile_k, layout=layout, **kw)
            else:
                pb[name] = sub
        packed_layers.append(pb)
    out["layers"] = packed_layers
    return out
