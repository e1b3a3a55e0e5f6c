from .quant_matmul import quant_matmul, quant_matmul_reference
