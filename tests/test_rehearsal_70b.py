"""Reduced-depth run of the 70B rehearsal machinery (scripts/
rehearse_70b.py): the tensor-parallel decode step at the REAL Llama-2-70B
layer geometry (hidden 8192, inter 28672, 64 q / 8 kv heads, W3A16g128)
must AOT-lower and compile over the tp=8 mesh, and the per-shard memory
arithmetic must extrapolate to a v5e fit at 80 layers. The full-depth
artifact lives at docs/artifacts/rehearsal_70b.json."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_70b_geometry_tp8_decode_lowers_and_fits():
    from scripts.rehearse_70b import rehearse

    r = rehearse(layers=2, max_len=512, n_steps=2)
    assert r["fits_v5e"]
    ma = r["xla_memory_analysis"]
    assert ma.get("argument_size_in_bytes", 0) > 0, ma
    # extrapolate per-shard residency to the full 80-layer model: embed +
    # lm_head are replicated (layer-independent), layers scale linearly
    per_layer_w = None
    # 2-layer weight shard minus the replicated embeds (2 x 0.524 GB)
    embeds_gb = 2 * 32000 * 8192 * 2 / 1e9
    per_layer_w = (r["per_shard_weight_gb"] - embeds_gb) / 2
    full_w = embeds_gb + 80 * per_layer_w
    # kv cache scales linearly in layers and max_len: 2 layers @512 ->
    # 80 layers @2048
    full_kv = r["per_shard_kv_cache_gb"] * (80 / 2) * (2048 / 512)
    assert full_w + full_kv < 16.0 * 0.9, (full_w, full_kv)
