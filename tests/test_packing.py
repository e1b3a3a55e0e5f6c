"""Pack/unpack round-trip tests for int32 packed weights."""
import numpy as np
import jax.numpy as jnp
import pytest

from omniquant_tpu.quant import (
    QuantConfig,
    fake_quant_weight,
    pack_codes,
    unpack_codes,
    pack_weight,
    dequantize_packed,
)


@pytest.mark.parametrize("bits", [2, 3, 4, 6, 8])
def test_pack_unpack_roundtrip(bits):
    rng = np.random.default_rng(bits)
    out_f, in_f = 24, 130  # non-multiple of vals_per_word on purpose
    codes = jnp.asarray(
        rng.integers(0, 2**bits, size=(out_f, in_f)), jnp.int32
    )
    packed = pack_codes(codes, bits)
    assert packed.dtype == jnp.int32
    unpacked = unpack_codes(packed, bits, in_f)
    np.testing.assert_array_equal(np.asarray(unpacked), np.asarray(codes).T)


@pytest.mark.parametrize("bits,group_size", [(2, 32), (3, 32), (4, 32), (6, 32), (6, None), (4, None)])
def test_packed_dequant_matches_fake_quant(bits, group_size):
    """pack_weight -> dequantize_packed == fake_quant_weight (transposed)."""
    rng = np.random.default_rng(10 + bits)
    w = jnp.asarray(rng.standard_normal((16, 64)).astype(np.float32))
    cfg = QuantConfig(n_bits=bits, group_size=group_size)
    pw = pack_weight(w, cfg)
    deq_t = dequantize_packed(pw)  # (in, out)
    fq = fake_quant_weight(w, cfg)  # (out, in)
    np.testing.assert_allclose(
        np.asarray(deq_t), np.asarray(fq).T, rtol=1e-5, atol=1e-5
    )


def test_packed_matmul_matches_fake_quant_matmul():
    rng = np.random.default_rng(42)
    w = jnp.asarray(rng.standard_normal((32, 64)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    cfg = QuantConfig(n_bits=4, group_size=16)
    pw = pack_weight(w, cfg, bias=b)
    y_packed = x @ dequantize_packed(pw) + pw.bias
    y_fake = x @ fake_quant_weight(w, cfg).T + b
    np.testing.assert_allclose(
        np.asarray(y_packed), np.asarray(y_fake), rtol=1e-4, atol=1e-4
    )


def test_compression_ratio():
    """W4g128 packed storage ~4.25 bits/weight; W2g128 ~2.25."""
    w = jnp.zeros((256, 512), jnp.float32)
    for bits, expect in [(4, 4.25), (2, 2.25)]:
        cfg = QuantConfig(n_bits=bits, group_size=128)
        pw = pack_weight(w + 0.1, cfg)
        n_weights = 256 * 512
        total_bits = (
            pw.qweight.size * 32 + pw.scales.size * 16 + pw.zeros.size * 16
        )  # scales/zeros counted at fp16 storage width
        assert total_bits / n_weights == pytest.approx(expect, rel=0.02)


def test_pairs_layout_roundtrip():
    """pack/unpack roundtrip of the pairs layout (codes 16 bits apart per
    word so the kernel manufactures bf16 pairs with one op)."""
    import numpy as np
    import jax.numpy as jnp
    from omniquant_tpu.quant.packing import pack_codes, unpack_codes

    rng = np.random.default_rng(3)
    for bits, in_f, words in ((2, 512, 32), (3, 1280, 128), (4, 512, 64)):
        codes = jnp.asarray(
            rng.integers(0, 2**bits, (96, in_f)), jnp.int32)  # (out, in)
        packed = pack_codes(codes, bits, group_size=128, layout="pairs")
        # 2/4-bit: exact bits/32 per word; 3-bit: 10 contiguous codes per
        # word (3.2 effective bits) so the decode fast path runs ONE
        # injected pass instead of the planar 2+1 planes' two
        assert packed.shape[0] == words
        got = unpack_codes(packed, bits, in_f, group_size=128,
                           layout="pairs")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(codes.T))


def test_pairs_layout_default_selection():
    from omniquant_tpu.quant.packing import default_layout

    assert default_layout(4, 128) == "pairs"
    assert default_layout(2, None) == "pairs"
    assert default_layout(4, 64) == "planar"   # fine groups: fma path
    assert default_layout(3, 128) == "pairs"   # contiguous 10-codes/word
    assert default_layout(8, 128) == "planar"  # 8-bit codes overflow bf16


def test_packed_checkpoint_roundtrip_preserves_layout(tmp_path):
    """save_pytree/load_pytree must carry the wire layout: a pairs-3
    PackedWeight reloaded as planar would silently dequantize garbage
    (the two 3-bit wire formats are incompatible)."""
    from omniquant_tpu.utils.checkpoint import load_pytree, save_pytree

    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.standard_normal((128, 160)).astype(np.float32))
    cfg = QuantConfig(n_bits=3, group_size=32)
    for layout in ("planar", "pairs"):
        pw = pack_weight(w, cfg, layout=layout)
        path = str(tmp_path / f"pw_{layout}.npz")
        save_pytree(path, {"w": pw})
        back = load_pytree(path)["w"]
        assert back.layout == layout
        assert back.tile_k == pw.tile_k
        np.testing.assert_allclose(
            np.asarray(dequantize_packed(back)),
            np.asarray(dequantize_packed(pw)), rtol=0, atol=0)


def test_packed_checkpoint_rejects_unversioned_meta(tmp_path):
    """Pre-v2 checkpoints (5-int meta, no layout) must be refused, not
    silently loaded under a guessed layout."""
    from omniquant_tpu.utils.checkpoint import load_pytree, save_pytree

    w = jnp.asarray(np.random.default_rng(8).standard_normal(
        (64, 64)).astype(np.float32))
    pw = pack_weight(w, QuantConfig(n_bits=4, group_size=32))
    path = str(tmp_path / "old.npz")
    save_pytree(path, {"w": pw})
    # rewrite the meta array to the old 5-int format
    data = dict(np.load(path, allow_pickle=False))
    meta_key = [k for k in data if k.endswith("meta||__leaf__")][0]
    data[meta_key] = data[meta_key][:5]
    np.savez(path, **data)
    with pytest.raises(ValueError, match="layout"):
        load_pytree(path)
